package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.store.LakeCatalog

class DocIngestSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private def tmp() = Files.createTempDirectory("docingest").toString

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "source")

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val stage = Files.createTempDirectory("di-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
  }

  test("applyBatch admits only store-fresh, batch-unique documents") {
    val cat = new LakeCatalog(spark, tmp())
    cat.createDatabase("ing")
    val corpus = cat.table("ing.corpus")
    val fps = cat.table("ing.fps")

    DocIngest.applyBatch(docs(
      (1L, "alpha bravo charlie", "a"),
      (2L, "delta echo foxtrot", "a")), corpus, fps) shouldBe 2L

    // batch 2: doc 3 duplicates doc 1's content (normalization-equal),
    // docs 4/5 duplicate each other within the batch
    DocIngest.applyBatch(docs(
      (3L, "Alpha  Bravo charlie!", "b"),
      (4L, "golf hotel india", "b"),
      (5L, "golf hotel india", "b")), corpus, fps) shouldBe 1L

    corpus.read.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 4L)
    fps.read.count() shouldBe 3L
  }

  test("replaying an applied batch is a no-op (content-level idempotence)") {
    val cat = new LakeCatalog(spark, tmp())
    cat.createDatabase("ing")
    val corpus = cat.table("ing.corpus2")
    val fps = cat.table("ing.fps2")
    val b = docs((1L, "kilo lima mike", "a"), (2L, "november oscar papa", "a"))
    DocIngest.applyBatch(b, corpus, fps) shouldBe 2L
    val versionAfter = corpus.currentSnapshot.get.version
    // the replay finds its own fingerprints in the store
    DocIngest.applyBatch(b, corpus, fps) shouldBe 0L
    corpus.read.count() shouldBe 2L
    corpus.currentSnapshot.get.version shouldBe versionAfter // no empty commit
  }

  test("streaming ingest: availableNow drains files; checkpoint restart adds nothing") {
    val cat = new LakeCatalog(spark, tmp())
    cat.createDatabase("ing")
    val corpus = cat.table("ing.corpus3")
    val fps = cat.table("ing.fps3")
    val src = tmp()
    val ckpt = tmp()
    writeBatch(docs(
      (1L, "quebec romeo sierra", "a"),
      (2L, "tango uniform victor", "a")), src, 1)
    writeBatch(docs(
      (3L, "quebec  ROMEO sierra", "b"), // content dup of doc 1
      (4L, "whiskey xray yankee", "b")), src, 2)

    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    DocIngest.runIngest(stream, corpus, fps, ckpt).awaitTermination()
    corpus.read.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 4L)

    // restart on the same checkpoint with no new files: nothing re-runs
    DocIngest.runIngest(stream, corpus, fps, ckpt).awaitTermination()
    corpus.read.count() shouldBe 3L

    // a FRESH checkpoint replays both files — the fingerprint store
    // still rejects every document (content-level exactly-once)
    DocIngest.runIngest(stream, corpus, fps, tmp()).awaitTermination()
    corpus.read.count() shouldBe 3L
  }
}
