package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog tonight"
  private val near2 = "the quick brown fox jumps over the lazy cat tonight"
  private val other = "completely different content with no shared phrasing at all"

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")

  test("exactGroups and exactDedup collapse normalization-equal docs") {
    val d = docs(
      (1L, "Hello,   World!", "a"),
      (2L, "hello world", "a"),
      (3L, other, "a"))
    val groups = Dedup.exactGroups(d).collect()
    groups.length shouldBe 2
    groups.find(_.getLong(2) == 2L).get.getLong(1) shouldBe 1L // min doc survives
    Dedup.exactDedup(d).select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 3L)
  }

  test("incrementalDedup drops history-known and batch-internal duplicates") {
    val hist = Dedup.fingerprints(docs((100L, near1, "h")))
    val incoming = docs(
      (1L, near1, "a"),   // known in history -> dropped
      (2L, near2, "a"),   // fresh
      (3L, near2, "b"),   // batch-internal dup of 2 -> dropped
      (4L, other, "a"))   // fresh
    val out = Dedup.incrementalDedup(incoming, hist)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    out shouldBe Array(2L, 4L)
  }

  test("incrementalDedup with empty history equals exactDedup") {
    val d = docs((1L, near1, "a"), (2L, near1, "a"), (3L, other, "a"))
    val emptyHist = Dedup.fingerprints(d.filter(col("doc_id") < 0))
    Dedup.incrementalDedup(d, emptyHist).select("doc_id")
      .collect().map(_.getLong(0)).sorted shouldBe
      Dedup.exactDedup(d).select("doc_id").collect().map(_.getLong(0)).sorted
  }

  test("bloomIncrementalDedup is bit-identical to the plain incremental path") {
    val corpus = (0L until 60L).map(i =>
      (i, if (i % 7 == 0) near1 else s"unique text number $i", s"s${i % 3}"))
    val d = docs(corpus: _*)
    val hist = Dedup.fingerprints(d.filter(col("doc_id") % 4 === 0))
    val incoming = d.filter(col("doc_id") % 4 =!= 0)
    val plain = Dedup.incrementalDedup(incoming, hist)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val bloomed = Dedup.bloomIncrementalDedup(incoming, hist)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    bloomed shouldBe plain
  }

  test("bloomIncrementalDedup probes the sketch map-side below the anti-join") {
    // parquet-backed source: a LocalRelation would be folded away by
    // ConvertToLocalRelation and hide the probe from the plan
    val tmp = java.nio.file.Files.createTempDirectory("bloomdedup").toString
    docs((1L, near1, "a"), (2L, near2, "a"), (3L, other, "b"))
      .write.parquet(s"$tmp/d")
    val d = spark.read.parquet(s"$tmp/d")
    val hist = Dedup.fingerprints(d.filter(col("doc_id") === 1L))
    // inspect the LAZY pipeline: the public method materializes eagerly
    // (to release its staged cache), which truncates the visible plan
    val (lazyOut, stagedFrames) =
      Dedup.bloomIncrementalDedupPlan(d.filter(col("doc_id") =!= 1L), hist)
    val plan = lazyOut.queryExecution.optimizedPlan.toString
    stagedFrames.foreach(_.unpersist(false))
    plan should include("graft_bloom_might_contain")
    // the might-dup branch probes BELOW the anti-join (its child in the
    // printed tree), so only sketch-positive rows reach the join
    plan should include("Join LeftAnti")
    plan.lastIndexOf("graft_bloom_might_contain") should be >
      plan.indexOf("Join LeftAnti")
  }

  test("incrementalNearDuplicates scores only incoming-vs-history pairs") {
    val hist = docs((10L, near1, "h"), (11L, other, "h"))
    val incoming = docs(
      (1L, near2, "a"),  // near-dup of history 10
      (2L, near2, "a"))  // near-dup of 1 AND of history 10
    val pairs = Dedup.incrementalNearDuplicates(incoming, hist, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // 1-2 (incoming x incoming) and 10-11 (history x history) never appear
    pairs shouldBe Array((1L, 10L), (2L, 10L))
  }

  test("incrementalNearDuplicates matches the full-corpus cross-side subset") {
    val d = docs(
      (1L, near1, "a"), (2L, near2, "a"), (3L, other, "a"),
      (4L, near1, "b"), (5L, near2 + " extra", "b"))
    val incoming = d.filter(col("doc_id") % 2 === 0)
    val history = d.filter(col("doc_id") % 2 =!= 0)
    val incr = Dedup.incrementalNearDuplicates(incoming, history, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: all-pairs result restricted to (even, odd) sides
    val full = Dedup.lshNearDuplicates(d, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a % 2 == 0 && b % 2 != 0 }
      .toSet
    incr shouldBe full
  }

  test("lshNearDuplicates finds true near-dups and respects threshold") {
    val d = docs((1L, near1, "a"), (2L, near2, "a"), (3L, other, "a"))
    val pairs = Dedup.lshNearDuplicates(d, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs shouldBe Array((1L, 2L))
    // raising the threshold above their Jaccard removes the pair
    Dedup.lshNearDuplicates(d, threshold = 0.99).count() shouldBe 0
  }

  test("maxBucket guard drops boilerplate buckets entirely") {
    // 5 identical docs: every band bucket has size 5
    val many = docs((1 to 5).map(i => (i.toLong, near1, "a")): _*)
    Dedup.lshNearDuplicates(many, maxBucket = 4).count() shouldBe 0
    Dedup.lshNearDuplicates(many, maxBucket = 5).count() shouldBe 10 // C(5,2)
  }

  test("charNgramNearDuplicates catches word-boundary edits and respects threshold") {
    // same chars, shifted word boundary: token Jaccard is low but char
    // 4-gram overlap stays high
    val d = docs(
      (1L, "the quick brownfox jumps over the lazy dog", "a"),
      (2L, "the quick brown fox jumps over the lazy dog", "a"),
      (3L, other, "a"))
    val pairs = Dedup.charNgramNearDuplicates(d, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs shouldBe Array((1L, 2L))
    Dedup.charNgramNearDuplicates(d, threshold = 0.999).count() shouldBe 0
  }

  test("blockedJaccardPairs confines candidates to the block") {
    val d = docs((1L, near1, "blockA"), (2L, near2, "blockB"), (3L, near2, "blockA"))
    val pairs = Dedup.blockedJaccardPairs(d, "source", threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    pairs shouldBe Array(("blockA", 1L, 3L)) // cross-block near-dup invisible
  }

  test("simhashNearDuplicates: identical docs at distance 0, verified exactly") {
    val d = docs((1L, near1, "a"), (2L, near1, "a"), (3L, other, "a"))
    val out = Dedup.simhashNearDuplicates(d).collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 2L, 0L))
  }

  test("minhashSignatures filters docs shorter than the shingle size") {
    val d = docs((1L, "one two", "a"), (2L, near1, "a"))
    val sigs = Dedup.minhashSignatures(d, shingleSize = 3, k = 4)
    sigs.count() shouldBe 1
    sigs.head.getAs[scala.collection.Seq[String]]("sig").length shouldBe 4
  }

  test("nearDupClusters: chains merge transitively, components stay separate") {
    import spark.implicits._
    // component {1,2,3,7} via chain 1-2, 2-3, 3-7; component {5,9}; pair order mixed
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 3L), (9L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.nearDupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 5L -> 5L, 9L -> 5L)
  }

  test("nearDupClusters: empty pair set yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    Dedup.nearDupClusters(empty).count() shouldBe 0L
  }

  test("nearDupClusters: a 1000-node path converges in O(log n) star rounds") {
    import spark.implicits._
    // the adversarial chain shape for min-label propagation (diameter =
    // 999 would need ~999 propagation rounds); large-star/small-star
    // doubles the hang-depth per round, so ~log2(1000) + epsilon rounds
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // threshold 0 forces the DISTRIBUTED tier (the default would take
    // the driver union-find shortcut for a graph this small)
    val (labels, rounds) = Dedup.nearDupClustersWithRounds(path, driverEdgeThreshold = 0L)
    withClue(s"rounds = $rounds: ") { rounds should be <= 12 }
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    out.length shouldBe 1000
    all(out.map(_._2)) shouldBe 0L
  }

  test("nearDupClusters matches union-find on a randomized pair soup") {
    import spark.implicits._
    // deterministic pseudo-random edges over 120 nodes, several
    // components + isolated self-referencing shapes mixed in
    val edges = (1 to 150).map { i =>
      val a = (i * 7919L) % 120
      val b = (a + (i * 104729L) % 7 + 1) % 120
      (a, b)
    }
    // reference labels via driver-side union-find
    val parent = Array.tabulate(120)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n.toInt).toLong).toMap
    // BOTH tiers must agree with the reference: the driver union-find
    // shortcut (default threshold) and the distributed star rounds
    // (threshold 0)
    val out = Dedup.nearDupClusters(edges.toDF("doc_a", "doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    out shouldBe expected
    val distributed = Dedup
      .nearDupClustersWithRounds(edges.toDF("doc_a", "doc_b"), driverEdgeThreshold = 0L)
      ._1.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    distributed shouldBe expected
  }

  test("crossSplitContamination scores containment, not Jaccard") {
    // eval doc (5 tokens -> 3 shingles) fully embedded in a longer train
    // doc: containment 1.0 even though symmetric Jaccard would be 3/8
    val e = docs((10L, "alpha beta gamma delta epsilon", "e"))
    val t = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "t"),
      (2L, other, "t"))
    val out = Dedup.crossSplitContamination(e, t, threshold = 0.5).collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe
      Seq((10L, 1L, 1.0))
    // a threshold above the containment removes the pair
    Dedup.crossSplitContamination(e, t, threshold = 1.01).count() shouldBe 0
  }

  test("decontaminate removes exactly the flagged training docs") {
    val e = docs((10L, "alpha beta gamma delta epsilon", "e"))
    val t = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "t"),
      (2L, other, "t"))
    val flagged = Dedup.crossSplitContamination(e, t, threshold = 0.5)
    Dedup.decontaminate(t, flagged)
      .select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(2L)
  }

  test("exactSubstringDedup removes non-owner span occurrences and rebuilds text") {
    // docs 1 and 2 share the 6-token span "one two three four five six"
    // (covered by two 5-grams); doc 1 is the lexicographic owner and
    // keeps it, doc 2 loses exactly those 6 tokens; doc 3 is untouched
    val d = docs(
      (1L, "one two three four five six alpha beta", "a"),
      (2L, "gamma one two three four five six delta", "a"),
      (3L, other, "a"))
    val out = Dedup.exactSubstringDedup(d, shingleSize = 5)
      .orderBy("doc_id").collect()
    out.length shouldBe 3
    out(0).getString(3) shouldBe "one two three four five six alpha beta"
    out(0).getLong(2) shouldBe 0L
    out(1).getString(3) shouldBe "gamma delta"
    out(1).getLong(2) shouldBe 6L
    out(2).getString(3) shouldBe other
    out(2).getLong(2) shouldBe 0L
  }

  test("exactSubstringDedup deduplicates a span repeated INSIDE one document") {
    val d = docs(
      (1L, "a b c d e x a b c d e", "a"),
      (2L, other, "a"))
    val out = Dedup.exactSubstringDedup(d, shingleSize = 5)
      .orderBy("doc_id").collect()
    // the second occurrence of "a b c d e" (positions 6..10) is removed
    out(0).getString(3) shouldBe "a b c d e x"
    out(0).getLong(1) shouldBe 11L
    out(0).getLong(2) shouldBe 5L
  }

  test("crossSplitContamination maxDf guard drops boilerplate shingles") {
    val e = docs((10L, "alpha beta gamma", "e"))
    val t = docs((1L to 5L).map(i => (i, "alpha beta gamma", "t")): _*)
    // the one shared shingle sits in 5 training docs: df-capped at 4 the
    // signal disappears; at 5 every training doc scores 1.0
    Dedup.crossSplitContamination(e, t, maxDf = 4, threshold = 0.1)
      .count() shouldBe 0
    Dedup.crossSplitContamination(e, t, maxDf = 5, threshold = 0.1)
      .count() shouldBe 5
  }
}
