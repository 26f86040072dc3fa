package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.LakeCatalog

/** Persistent LSH near-dup index: build/append/query over LakeTables,
  * bit-compatible with the one-shot incremental operator. */
class LshIndexSpec extends SparkSpec {

  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog tonight"
  private val near2 = "the quick brown fox jumps over the lazy cat tonight"
  private val other = "completely different content with no shared phrasing at all"

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (i, t) => (i, t, "s") }.toDF("doc_id", "text", "source")

  private def freshCatalog() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("lsh-wh").toString)
    cat.createDatabase("ix")
    cat
  }

  test("query matches the one-shot incremental operator on the same split") {
    val corpus = docs((0L until 30L).map(i =>
      (i, if (i % 6 == 0) near1 else s"unique line number $i with words")): _*)
    val hist = corpus.filter(col("doc_id") % 3 =!= 2)
    val incoming = corpus.filter(col("doc_id") % 3 === 2)
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", hist)
    val indexed = LshIndex.query(cat, "ix", "nd", incoming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val oneShot = Dedup.incrementalNearDuplicates(incoming, hist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    indexed shouldBe oneShot
    indexed should not be empty
  }

  test("append extends the index without touching existing band files") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, other)))
    val v1 = cat.table("ix.nd_bands").currentSnapshot.get
    LshIndex.append(cat, "ix", "nd", docs((10L, near2)))
    val v2 = cat.table("ix.nd_bands").currentSnapshot.get
    v2.operation shouldBe "append"
    v2.entries.map(_.dir) should contain allElementsOf v1.entries.map(_.dir)
    // the probe finds matches from BOTH generations
    val hits = LshIndex.query(cat, "ix", "nd", docs((100L, near1)))
      .collect().map(_.getLong(1)).sorted
    hits shouldBe Array(1L, 10L)
  }

  test("parameters are pinned: a rebuilt-at-different-k index answers consistently") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1)), k = 8, bands = 4)
    cat.table("ix.nd_bands").properties("lsh.k") shouldBe "8"
    // rebuild with different params replaces both tables and properties
    LshIndex.build(cat, "ix", "nd", docs((1L, near1)), k = 4, bands = 2)
    cat.table("ix.nd_bands").properties("lsh.k") shouldBe "4"
    LshIndex.query(cat, "ix", "nd", docs((2L, near1)))
      .collect().map(_.getLong(1)).toSeq shouldBe Seq(1L)
  }

  test("a missing-parameter index fails fast instead of probing garbage") {
    val cat = freshCatalog()
    // a bands table created OUTSIDE build carries no lsh.* properties
    cat.table("ix.bare_bands").createOrReplace(
      Seq(("x", 1L)).toDF("band", "doc_id"))
    an[IllegalStateException] should be thrownBy
      LshIndex.query(cat, "ix", "bare", docs((2L, near1)))
  }
}
