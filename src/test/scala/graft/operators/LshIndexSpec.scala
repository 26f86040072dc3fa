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

  test("probe plans only the index entries that can hold a matching band") {
    val cat = freshCatalog()
    // generation A: one content family; generation B (appended): another.
    // The probe is a near-dup of B only — its band values (minhashes of
    // B-ish shingles) appear in no generation-A file, so the band bloom
    // sidecars must drop A's entries at planning time, and the candidate
    // ids must likewise drop A's token-set entries.
    // pruneMinBytes = 0 forces the at-scale behavior on a test-sized
    // index: sidecars built from the first commit, probes pruned
    LshIndex.build(cat, "ix", "nd",
      docs((0L until 8L).map(i => (i, s"alpha beta gamma delta line $i here")): _*),
      pruneMinBytes = 0L)
    LshIndex.appendBatch(cat, "ix", "nd", docs((100L, near1), (101L, other)), 1L)
    val hits = LshIndex.query(cat, "ix", "nd", docs((200L, near2)))
      .collect().map(_.getLong(1)).sorted
    hits shouldBe Array(100L)
    val st = LshIndex.lastProbeStats.get
    st.bandFallback shouldBe false
    st.toksFallback shouldBe false
    // both tables hold two generations (build + append); only the
    // append generation can match the probe
    st.bandEntriesTotal should be >= 2
    st.bandEntriesPlanned should be < st.bandEntriesTotal
    st.toksEntriesTotal should be >= 2
    st.toksEntriesPlanned should be < st.toksEntriesTotal
  }

  test("oversized probe falls back to the full-index scan with identical results") {
    val corpus = docs((0L until 24L).map(i =>
      (i, if (i % 5 == 0) near1 else s"filler text row $i keeps going")): _*)
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", corpus, pruneMinBytes = 0L)
    val probe = docs((300L, near2), (301L, "unrelated wording entirely"))
    val pruned = LshIndex.query(cat, "ix", "nd", probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val full = LshIndex.query(cat, "ix", "nd", probe, maxProbeKeys = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    LshIndex.lastProbeStats.get.bandFallback shouldBe true
    LshIndex.lastProbeStats.get.toksFallback shouldBe true
    full shouldBe pruned
    full should not be empty
  }

  test("a probe batch entirely under the shingle floor yields empty, no scan") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1)), pruneMinBytes = 0L)
    val out = LshIndex.query(cat, "ix", "nd", docs((9L, "two words")))
    out.collect() shouldBe empty
    val st = LshIndex.lastProbeStats.get
    st.bandKeys shouldBe 0
    st.bandEntriesPlanned shouldBe 0
    st.toksEntriesPlanned shouldBe 0
  }

  test("an index under the size floor takes the single-job bypass plan") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, other)))
    val hits = LshIndex.query(cat, "ix", "nd", docs((50L, near2)))
      .collect().map(_.getLong(1)).sorted
    hits shouldBe Array(1L)
    LshIndex.lastProbeStats.get.tinyBypass shouldBe true
    // under the floor, commits also SKIP the sidecar-build job —
    // filters nothing would read (the bypass plan never consults them)
    cat.table("ix.nd_bands").currentSnapshot.get.entries
      .forall(_.blooms.isEmpty) shouldBe true
    cat.table("ix.nd_toks").currentSnapshot.get.entries
      .forall(_.blooms.isEmpty) shouldBe true
    // a malformed floor value degrades to the default, never throws
    cat.table("ix.nd_bands").setProperties(
      Map(LshIndex.ProbePruneMinBytesProp -> "not-a-number"))
    LshIndex.query(cat, "ix", "nd", docs((51L, near2)))
      .collect().map(_.getLong(1)).sorted shouldBe Array(1L)
    LshIndex.lastProbeStats.get.tinyBypass shouldBe true
  }

  test("compact folds generations, backfills sidecars, preserves probe results") {
    val cat = freshCatalog()
    // four generations under the default floor: no sidecars anywhere
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, other)))
    LshIndex.appendBatch(cat, "ix", "nd",
      docs((10L, "some fresh material in batch ten right here")), 1L)
    LshIndex.appendBatch(cat, "ix", "nd",
      docs((11L, "entirely new phrasing for batch eleven today")), 2L)
    LshIndex.appendBatch(cat, "ix", "nd", docs((12L, near2)), 3L)
    val bandsT = cat.table("ix.nd_bands")
    bandsT.currentSnapshot.get.entries.size should be >= 4
    bandsT.currentSnapshot.get.entries.forall(_.blooms.isEmpty) shouldBe true
    val probe = docs((500L, near2))
    val before = LshIndex.query(cat, "ix", "nd", probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    before.map(_._2).toSeq shouldBe Seq(1L, 12L)
    // drop the floor (operator decision: this index is heading past
    // it), then compact — the rewrite re-lands every generation's rows
    // WITH sidecars, through the same floor-gated write path
    Seq("ix.nd_bands", "ix.nd_toks").foreach(t =>
      cat.table(t).setProperties(Map(
        LshIndex.ProbePruneMinBytesProp -> "0",
        "write.bloom.min-table-bytes" -> "0")))
    LshIndex.compact(cat, "ix", "nd")
    val folded = cat.table("ix.nd_bands").currentSnapshot.get
    folded.entries.size shouldBe 1
    folded.entries.forall(_.blooms.nonEmpty) shouldBe true
    cat.table("ix.nd_toks").currentSnapshot.get.entries
      .forall(_.blooms.nonEmpty) shouldBe true
    // probe parity through the pruned plan, and the replay high-water
    // mark survived the rewrite: batch 3 is still a no-op
    val after = LshIndex.query(cat, "ix", "nd", probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    after shouldBe before
    LshIndex.lastProbeStats.get.tinyBypass shouldBe false
    LshIndex.appendBatch(cat, "ix", "nd", docs((12L, near2)), 3L) shouldBe false
  }

  test("remove retracts a document from every later probe, others unaffected") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, near2), (3L, other)))
    LshIndex.query(cat, "ix", "nd", docs((50L, near1)))
      .collect().map(_.getLong(1)).sorted shouldBe Array(1L, 2L)
    LshIndex.remove(cat, "ix", "nd", docs((1L, near1)).select("doc_id"))
    // doc 1 gone from candidates AND verify; doc 2 still pairs
    LshIndex.query(cat, "ix", "nd", docs((51L, near1)))
      .collect().map(_.getLong(1)).sorted shouldBe Array(2L)
    cat.table("ix.nd_toks").read.filter(col("doc_id") === 1L).count() shouldBe 0
    // appends still work after a removal (properties/params intact)
    LshIndex.append(cat, "ix", "nd", docs((60L, near1)))
    LshIndex.query(cat, "ix", "nd", docs((52L, near1)))
      .collect().map(_.getLong(1)).sorted shouldBe Array(2L, 60L)
  }

  test("remove under merge-on-read delete mode stays exact") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, near2), (3L, other)))
    Seq("ix.nd_bands", "ix.nd_toks").foreach(t =>
      cat.table(t).setProperties(Map("write.delete.mode" -> "merge-on-read")))
    LshIndex.remove(cat, "ix", "nd", docs((2L, near2)).select("doc_id"))
    cat.table("ix.nd_bands").currentSnapshot.get.operation should include("mor")
    LshIndex.query(cat, "ix", "nd", docs((70L, near1)))
      .collect().map(_.getLong(1)).sorted shouldBe Array(1L)
  }

  test("retraction after a fold prunes via doc_id blooms, never rewriting the wide entry") {
    val cat = freshCatalog()
    // sidecars ON from the start (floor 0), tiny-rewrite dispatch OFF:
    // this pins the at-scale plan on a small fixture
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, near2), (3L, other)),
      pruneMinBytes = 0L)
    LshIndex.appendBatch(cat, "ix", "nd",
      docs((10L, "some fresh material in batch ten right here")), 1L)
    Seq("ix.nd_bands", "ix.nd_toks").foreach(t =>
      cat.table(t).setProperties(
        Map(graft.store.LakeTable.TinyRewriteMaxBytesProp -> "0")))
    LshIndex.compact(cat, "ix", "nd")
    cat.table("ix.nd_bands").currentSnapshot.get.entries.size shouldBe 1
    // a fresh generation lands AFTER the fold, its ids INSIDE the
    // folded id range — key-range stats cannot separate the two
    LshIndex.appendBatch(cat, "ix", "nd", docs((5L, near1)), 2L)
    // retract the fresh doc: only ITS generation holds doc_id 5, and
    // the folded entry's doc_id bloom proves that — the wide entry
    // (the whole pre-fold corpus) is never rewritten
    LshIndex.remove(cat, "ix", "nd", docs((5L, near1)).select("doc_id"))
    val bandsSnap = cat.table("ix.nd_bands").currentSnapshot.get
    bandsSnap.summary("rewritten-entries").toInt shouldBe 1
    bandsSnap.summary("untouched-entries").toInt should be >= 1
    cat.table("ix.nd_toks").currentSnapshot.get
      .summary("rewritten-entries").toInt shouldBe 1
    // retracting an id the index never held: every entry's bloom
    // proves absence — nothing is rewritten at all
    LshIndex.remove(cat, "ix", "nd", docs((7L, other)).select("doc_id"))
    cat.table("ix.nd_bands").currentSnapshot.get
      .summary("rewritten-entries").toInt shouldBe 0
    // the retracted doc is gone from probes; the folded corpus serves
    LshIndex.query(cat, "ix", "nd", docs((90L, near1)))
      .collect().map(_.getLong(1)).sorted shouldBe Array(1L, 2L)
  }

  test("a crash BETWEEN compact's two table rewrites leaves a fully serving index") {
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs((1L, near1), (2L, other)))
    LshIndex.appendBatch(cat, "ix", "nd", docs((10L, near2)), 1L)
    LshIndex.appendBatch(cat, "ix", "nd", docs((11L, near1)), 2L)
    val probe = docs((500L, near2))
    val before = LshIndex.query(cat, "ix", "nd", probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    // simulate compact dying after the toks rewrite, before the bands
    // rewrite (compact's documented order): contents are identical
    // either way, so the half-compacted index must answer identically,
    // the generation pin must not skew, and a re-run must finish the fold
    cat.table("ix.nd_toks").rewriteDataFiles()
    cat.table("ix.nd_toks").currentSnapshot.get.entries.size shouldBe 1
    cat.table("ix.nd_bands").currentSnapshot.get.entries.size should be >= 3
    LshIndex.query(cat, "ix", "nd", probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted shouldBe before
    LshIndex.appendBatch(cat, "ix", "nd", docs((11L, near1)), 2L) shouldBe false
    LshIndex.compact(cat, "ix", "nd") // the recovery: re-run the fold
    cat.table("ix.nd_bands").currentSnapshot.get.entries.size shouldBe 1
    LshIndex.query(cat, "ix", "nd", probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted shouldBe before
  }

  test("an index bootstrapped on an EMPTY corpus serves probes and appends") {
    // the IndexedDocStreams contract allows an empty bootstrap; since
    // r16 an all-empty write commits NO manifest entry, so this pins
    // that a zero-entry index is fully operational
    val cat = freshCatalog()
    LshIndex.build(cat, "ix", "nd", docs())
    cat.table("ix.nd_bands").currentSnapshot.get.entries shouldBe empty
    LshIndex.query(cat, "ix", "nd", docs((1L, near1))).count() shouldBe 0
    LshIndex.appendBatch(cat, "ix", "nd", docs((1L, near1)), 1L) shouldBe true
    LshIndex.query(cat, "ix", "nd", docs((2L, near2)))
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
