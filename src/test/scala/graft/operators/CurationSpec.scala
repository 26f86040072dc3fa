package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("hashBucket is deterministic and within [0, buckets)") {
    val ids = (1L to 200L).toDF("id")
    val once = ids.select(Curation.hashBucket($"id", 1000).as("b"))
      .collect().map(_.getLong(0))
    once.forall(b => b >= 0 && b < 1000) shouldBe true
    val again = ids.select(Curation.hashBucket($"id", 1000).as("b"))
      .collect().map(_.getLong(0))
    once.toSeq shouldBe again.toSeq
    // buckets actually spread (not all equal)
    once.distinct.length should be > 50
  }

  test("stratifiedSample applies per-stratum rates and the default rate") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    // en kept fully (rate 1000‰), de dropped fully (default 0‰)
    val out = Curation.stratifiedSample(df, "doc_id", "lang",
      Seq("en" -> 1000), defaultPermille = 0)
    out.count() shouldBe 1000
    out.select("lang").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("en")
    // default 1000‰ keeps everything
    Curation.stratifiedSample(df, "doc_id", "lang", Seq.empty, defaultPermille = 1000)
      .count() shouldBe 2000
    // a partial rate keeps roughly that fraction (deterministic exact count)
    val sampled = Curation.stratifiedSample(df, "doc_id", "lang",
      Seq("en" -> 500), defaultPermille = 0).count()
    sampled should be > 350L
    sampled should be < 650L
  }

  test("topFractionByValue keeps exactly the top fraction, ties share fate") {
    val df = (1 to 10).map(v => (v.toLong, v.toDouble)).toDF("id", "v")
    // cum_lt(v)/10 >= 0.8 first holds at v = 9
    Curation.topFractionByValue(df, "v", q = 0.8)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe Array(9L, 10L)
    // duplicate boundary values are all-in or all-out (decision is by value)
    val df2 = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 3.0)).toDF("id", "v")
    Curation.topFractionByValue(df2, "v", q = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe Array(4L)
    Curation.topFractionByValue(df2, "v", q = 0.25)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe Array(2L, 3L, 4L)
  }

  test("bm25TopDocs ranks by term frequency; docs without query terms drop out") {
    val docs = Seq(
      (1L, "spark spark spark pad pad pad"),
      (2L, "spark pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad")).toDF("doc_id", "text")
    val out = Curation.bm25TopDocs(docs, Seq("spark"), k = 5).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L) // doc 3 never scored
    out(0).getDouble(1) should be > out(1).getDouble(1)
  }

  test("repetitionStats flags degenerate repeats, clears diverse text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),       // one shingle repeated 4x
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs).orderBy("doc_id").collect()
    // doc 1: 4 shingles, 1 distinct -> dup 0.75, top 1.0
    out(0).getDouble(1) shouldBe 0.75
    out(0).getDouble(2) shouldBe 1.0
    // doc 2: all 4 shingles distinct -> dup 0, top 0.25
    out(1).getDouble(1) shouldBe 0.0
    out(1).getDouble(2) shouldBe 0.25
  }

  test("unigramLogLoss: rare-token docs score higher than stereotypical ones") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common zebra quark")).toDF("doc_id", "text")
    val out = Curation.unigramLogLoss(docs).orderBy("doc_id").collect()
    // corpus: common×6, zebra×1, quark×1 of 8 tokens.
    // doc 1 = -ln(6/8); doc 2 = -(2 ln(6/8) + 2 ln(1/8)) / 4
    out(0).getDouble(1) shouldBe math.rint(-math.log(6.0 / 8.0) * 1e4) / 1e4
    out(1).getDouble(1) shouldBe
      math.rint(-(2 * math.log(6.0 / 8.0) + 2 * math.log(1.0 / 8.0)) / 4.0 * 1e4) / 1e4
    out(1).getDouble(1) should be > out(0).getDouble(1)
  }

  test("topTfidfTermPerDoc surfaces the distinguishing term per doc") {
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common common yak"),
      (3L, "common common common")).toDF("doc_id", "text")
    val out = Curation.topTfidfTermPerDoc(docs).orderBy("doc_id").collect()
    out.map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "zebra"), (2L, "yak"), (3L, "common"))
    // zebra: tf=1, df=1, N=3 -> ln(3) rounded
    out(0).getDouble(4) shouldBe math.rint(math.log(3.0) * 1e4) / 1e4
    // a doc of only corpus-wide terms scores 0 (idf = ln(1))
    out(2).getDouble(4) shouldBe 0.0
  }
}
