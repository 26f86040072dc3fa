package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  // tiny 4-dim corpus: v1/v2 nearly parallel, v3 orthogonal-ish, v4 negated
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), "q"),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f), "a"),
    (2L, Array(0.98f, 0.15f, 0.05f, 0.0f), "a"),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), "b"),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), "b"))

  private def emb = vecs.toDF("vec_id", "embedding", "label")

  test("bruteKnn ranks by exact cosine") {
    val out = Similarity
      .bruteKnn(emb.filter($"vec_id" === 0), emb.filter($"vec_id" > 0), k = 2)
      .orderBy("rank").collect()
    out.map(_.getLong(2)).toSeq shouldBe Seq(1L, 2L)
    out.head.getDouble(3) shouldBe 0.995 +- 0.01
  }

  test("probeBuckets emits the bucket plus each one-bit flip, all distinct") {
    val rows = Seq("1010").toDF("b")
      .select(VectorFunctions.probeBuckets(col("b"), 4).as("p"))
      .collect().head.getSeq[String](0)
    rows shouldBe Seq("1010", "0010", "1110", "1000", "1011")
    rows.distinct.length shouldBe rows.length
  }

  test("multi-probe recall is a superset of single-probe at the same planes") {
    val queries = emb.filter($"vec_id" === 0)
    val corpus = emb.filter($"vec_id" > 0)
    val single = Similarity.lshKnn(queries, corpus, k = 4, planes = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val multi = Similarity.lshKnnMultiProbe(queries, corpus, k = 4, planes = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    single.subsetOf(multi) shouldBe true
    // the exact nearest neighbor must survive multi-probe at these sizes
    multi should contain(1L)
  }

  test("lshKnnMultiProbe never scores a (query, neighbor) pair twice") {
    val out = Similarity.lshKnnMultiProbe(
      emb.filter($"vec_id" < 2), emb.filter($"vec_id" >= 2), k = 10, planes = 3)
    val pairs = out.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    pairs.distinct.length shouldBe pairs.length
  }

  test("embeddingNearDuplicates finds parallel vectors and honors the threshold") {
    val pairs = Similarity.embeddingNearDuplicates(emb, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L)) // near-parallel pair
    pairs.map(_._1) should not contain 4L // negated vector matches nothing
    // cos(v1,v2) ≈ 0.995 < 0.9999 threshold
    Similarity.embeddingNearDuplicates(emb, threshold = 0.9999)
      .filter($"vec_a" === 1L && $"vec_b" === 2L).count() shouldBe 0
  }

  test("embeddingNearDuplicates multi-table recall >= any single table") {
    val both = Similarity.embeddingNearDuplicates(emb, threshold = 0.5, planes = 3, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = Similarity.embeddingNearDuplicates(emb, threshold = 0.5, planes = 3, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    one.subsetOf(both) shouldBe true
  }

  test("scalarQuantize: extremes hit codes 0/255 with zero error, midpoints round") {
    val df = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(1.0f, 20.0f)),
      (3L, Array(0.5f, 15.0f))).toDF("vec_id", "embedding")
    val out = Similarity.scalarQuantize(df).orderBy("vec_id").collect()
    // per-dim min -> code 0, per-dim max -> code 255; both reconstruct exactly
    out(0).getLong(1) shouldBe 0L
    out(0).getDouble(2) shouldBe 0.0
    out(1).getLong(1) shouldBe 510L
    out(1).getDouble(2) shouldBe 0.0
    // midpoint: floor(0.5 * 255 + 0.5) = 128 per dim; small nonzero error
    out(2).getLong(1) shouldBe 256L
    out(2).getDouble(2) should be > 0.0
    out(2).getDouble(2) should be < 0.05
  }

  test("productQuantize encodes subspaces independently; ties break by label") {
    // m=2 over the 4-dim fixture: subspaces are dims (0,1) and (2,3).
    // v0=(1,0,0,0) is label q's only member, so q's codeword in sub 0 is
    // exactly v0's subvector -> code q, err 0. In sub 1 both q's and b's
    // codewords are (0,0): a 0-0 tie, broken by label asc -> code "b".
    val out = Similarity.productQuantize(emb, m = 2).collect()
    out.length shouldBe vecs.length * 2
    out.foreach(_.getDouble(3) should be >= 0.0)
    val v0 = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
    v0(0).getString(2) shouldBe "q"
    v0(0).getDouble(3) shouldBe 0.0
    v0(1).getString(2) shouldBe "b"
    v0(1).getDouble(3) shouldBe 0.0
  }

  test("ivfPqKnn: full probe equals plain ADC; nprobe=1 restricts to one cell") {
    val queries = emb.filter($"vec_id" === 0)
    val corpus = emb.filter($"vec_id" > 0)
    // probing every cell (2 labels) makes the candidate cut a no-op, so
    // the composed search must equal unrestricted ADC over the corpus
    val full = Similarity.ivfPqKnn(queries, corpus, k = 4, m = 2, nprobe = 2)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    val adc = Similarity.adcKnn(queries, corpus, k = 4, m = 2)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    full.toSeq shouldBe adc.toSeq
    // nprobe=1: only the query's nearest cell ('a' = {1,2}) is scanned
    val one = Similarity.ivfPqKnn(queries, corpus, k = 4, m = 2, nprobe = 1)
      .collect().map(_.getLong(2)).toSet
    one shouldBe Set(1L, 2L)
  }

  test("recallAtK scores overlap per query, zero when disjoint") {
    val exact = Seq((0L, 1, 10L), (0L, 2, 11L), (7L, 1, 12L))
      .toDF("query_id", "rank", "neighbor_id")
    // approx == exact: full recall for query 0; query 7 has 1 of k=2 hits
    Similarity.recallAtK(exact, exact, k = 2)
      .orderBy("query_id").collect()
      .map(_.getDouble(1)).toSeq shouldBe Seq(1.0, 0.5)
    val miss = Seq((0L, 1, 99L), (7L, 1, 98L)).toDF("query_id", "rank", "neighbor_id")
    Similarity.recallAtK(miss, exact, k = 2)
      .orderBy("query_id").collect()
      .map(_.getDouble(1)).toSeq shouldBe Seq(0.0, 0.0)
  }

  test("kmeansStep reassigns vectors to their nearest seed centroid") {
    // seed centroids: q=(1,0,0,0), a≈(0.985,0.125,0.025,0),
    // b=mean(v3,v4)=(-0.5,0.5,0,0). Cosine argmax: v0→q (1.0 vs ≈0.992),
    // v1/v2→a (≈0.9997 vs ≈0.995), v3→b (0.707 vs ≈0.13),
    // v4→b (0.707 vs -1) — every margin is wide, so the assignment is
    // numerically unambiguous.
    val out = Similarity.kmeansStep(emb).collect()
    out.map(r => r.getString(0) -> r.getLong(2)).toMap shouldBe
      Map("q" -> 1L, "a" -> 2L, "b" -> 2L)
    out.map(_.getLong(2)).sum shouldBe vecs.length.toLong
    out.foreach(_.getDouble(1) should be >= 0.0)
  }

  test("semanticDedup pairs only within a cell, above threshold, a<b once") {
    // v1,v2 share cell "a" (cos≈0.998); v3,v4 share cell "b" but are
    // orthogonal (cos 0) — only the (1,2) pair may survive at 0.9
    val out = Similarity.semanticDedup(emb, threshold = 0.9).collect()
    out.map(r => (r.getLong(1), r.getLong(2))).toSeq shouldBe Seq((1L, 2L))
    out.head.getDouble(3) should be > 0.99
  }

  test("mipsKnnNormPruned equals brute-force MIPS on randomized data") {
    val rnd = new scala.util.Random(42)
    val n = 120
    val dim = 8
    val rows = (0L until n).map { i =>
      // norms spread over ~2 orders of magnitude, like real item vectors
      val scale = math.pow(10, rnd.nextDouble() * 2).toFloat
      (i, Array.fill(dim)((rnd.nextFloat() * 2 - 1) * scale))
    }
    val df = rows.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding".cast("array<double>").as("qv"))
    val cs = df.filter($"vec_id" >= 3)
      .select($"vec_id", $"embedding".cast("array<double>").as("cv"))
    val pruned = Similarity.mipsKnnNormPruned(qs, cs, k = 4)
      .orderBy("query_id", "rank").collect()
    // naive reference: score every pair, rank per query
    val qRows = rows.filter(_._1 < 3)
    val cRows = rows.filter(_._1 >= 3)
    val expect = qRows.flatMap { case (qid, qv) =>
      cRows.map { case (cid, cv) =>
        (qid, cid, qv.zip(cv).map { case (a, b) => a.toDouble * b.toDouble }.sum)
      }.sortBy { case (_, cid, d) => (-d, cid) }.take(4).zipWithIndex
        .map { case ((_, cid, _), r) => (qid, r + 1, cid) }
    }
    pruned.map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2))).toSeq shouldBe expect
  }

  test("filteredKnn restricts neighbors to the query's label partition") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 80L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), s"t${i % 4}"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val qs = df.filter($"vec_id" < 4) // one query per label
    val cs = df.filter($"vec_id" >= 4)
    val out = Similarity.filteredKnn(qs, cs, k = 3)
      .orderBy("query_id", "rank").collect()
    out.length shouldBe 4 * 3
    // every neighbor carries the query's own label
    val lbl = rows.map(r => r._1 -> r._3).toMap
    out.foreach(r => lbl(r.getLong(2)) shouldBe r.getString(3))
    // and within a label it IS exact kNN: compare against bruteKnn run
    // on that label's slice alone
    val slice = Similarity.bruteKnn(
      qs.filter($"label" === "t0"), cs.filter($"label" === "t0"), k = 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    out.filter(_.getLong(0) == 0L).map(_.getLong(2)).toSeq shouldBe slice
  }

  test("matryoshkaKnn with a full-corpus shortlist equals exact bruteKnn") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1), "x"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val qs = df.filter($"vec_id" < 3)
    val cs = df.filter($"vec_id" >= 3)
    val exact = Similarity.bruteKnn(qs, cs, k = 4)
      .orderBy("query_id", "rank").collect()
    // shortlist covers the whole corpus → the prefix pass cannot drop a
    // true neighbor, so the re-rank must reproduce exact kNN
    val full = Similarity.matryoshkaKnn(qs, cs, k = 4, prefixDims = 4, shortlist = 57)
      .orderBy("query_id", "rank").collect()
    full.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      exact.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // tight shortlist: still k results per query, ranks contiguous
    val tight = Similarity.matryoshkaKnn(qs, cs, k = 4, prefixDims = 4, shortlist = 8)
      .orderBy("query_id", "rank").collect()
    tight.length shouldBe 3 * 4
    tight.groupBy(_.getLong(0)).values.foreach(
      _.map(_.getLong(1)).sorted.toSeq shouldBe Seq(1L, 2L, 3L, 4L))
  }

  test("bqKnn with a full-corpus shortlist equals exact bruteKnn") {
    val qs = emb.filter($"vec_id" === 0)
    val cs = emb.filter($"vec_id" > 0)
    val exact = Similarity.bruteKnn(qs, cs, k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val bq = Similarity.bqKnn(qs, cs, k = 3, shortlistK = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    bq shouldBe exact
  }

  test("bqKnn Hamming shortlist restricts the rerank candidate set") {
    val qs = emb.filter($"vec_id" === 0) // signs: (+,0,0,0) -> only bit 0
    val cs = emb.filter($"vec_id" > 0)
    // shortlist of 1: only the code-nearest candidate survives to the
    // rerank; v4 = (-1,0,0,0) has NO positive dims (code 0, Hamming 1),
    // while v1/v2 set extra sign bits — the id tie-break inside equal
    // Hamming keeps the choice deterministic
    val out = Similarity.bqKnn(qs, cs, k = 3, shortlistK = 1).collect()
    out.length shouldBe 1
  }
}
