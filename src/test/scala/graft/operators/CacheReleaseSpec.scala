package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The dedup/similarity pipelines persist staged frames (tokens, band
  * keys, unit vectors) internally; operators must RELEASE them once the
  * compact result is materialized — otherwise repeated invocations in a
  * long-lived session accumulate cached blocks indefinitely. After an
  * operator returns, the only surviving persistent RDD may be the
  * localCheckpoint of its (small) result — one block, not the 2-3
  * staged caches the pipeline used internally. */
class CacheReleaseSpec extends SparkSpec {

  import spark.implicits._

  private def docs = (1 to 60).map { i =>
    val base = s"sentence number $i with some shared words repeated across docs"
    (i.toLong, if (i % 3 == 0) base else s"$base unique tail $i", s"src${i % 2}")
  }.toDF("doc_id", "text", "source")

  private def embeddings = (1 to 40).map { i =>
    (i.toLong, Seq.tabulate(16)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 6f), i % 4)
  }.toDF("vec_id", "embedding", "label")

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  private def assertReleases(name: String)(op: => DataFrame): Unit = {
    val before = persistentCount
    op.count()
    val grew = persistentCount - before
    withClue(s"$name retained $grew persistent RDDs (max 1 = result checkpoint): ") {
      grew should be <= 1
    }
  }

  test("near-dup operators release their staged caches") {
    assertReleases("lshNearDuplicates") { Dedup.lshNearDuplicates(docs) }
    assertReleases("charNgramNearDuplicates") { Dedup.charNgramNearDuplicates(docs) }
    assertReleases("blockedJaccardPairs") {
      Dedup.blockedJaccardPairs(docs, "source", threshold = 0.3)
    }
    assertReleases("simhashNearDuplicates") { Dedup.simhashNearDuplicates(docs) }
    assertReleases("embeddingNearDuplicates") {
      Similarity.embeddingNearDuplicates(embeddings, threshold = 0.3)
    }
  }
}
