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

  test("weightedSample: weight-proportional, deterministic, without replacement") {
    // two weight classes: heavy docs (w=50) vs light (w=1); A-ES keys
    // must overselect the heavy class relative to its population share
    val df = (1L to 1000L).map(i => (i, if (i <= 200) 50L else 1L))
      .toDF("doc_id", "w")
    val picked = Curation.weightedSample(df, "doc_id", "w", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    picked.length shouldBe 100
    picked.map(_._1).distinct.length shouldBe 100 // without replacement
    // heavy docs are 20% of rows but ~91% of total weight: expect a
    // strong majority of the sample (binomial-safe loose bound)
    picked.count(_._2 == 50L) should be > 60
    // deterministic: a second run selects the identical set in order
    val again = Curation.weightedSample(df, "doc_id", "w", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    again.toSeq shouldBe picked.toSeq
    // zero/negative weights are floored, not pow(u, inf)
    val degenerate = (1L to 10L).map(i => (i, 0L)).toDF("doc_id", "w")
    Curation.weightedSample(degenerate, "doc_id", "w", k = 5)
      .count() shouldBe 5
  }

  test("cmsHeavyHitters: exact top-k with the CMS guarantee holding") {
    // skewed corpus: 'alpha' dominates, then 'beta', then a long tail
    val docs = (1 to 300).map { i =>
      val tail = s"t${i % 37}"
      (i.toLong, s"alpha alpha beta $tail")
    }.toDF("doc_id", "text")
    val out = Curation.cmsHeavyHitters(docs, "text", k = 3)
      .orderBy(org.apache.spark.sql.functions.desc("n_exact"),
        org.apache.spark.sql.functions.col("term"))
      .collect()
    out.map(r => (r.getString(0), r.getLong(1))).take(2).toSeq shouldBe
      Seq(("alpha", 600L), ("beta", 300L))
    // the CMS never undercounts and eps*N bounds the overcount — the
    // flag the oracle gate asserts must hold here too
    all(out.map(_.getBoolean(2))) shouldBe true
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

  test("packSequences: offsets form an exact prefix sum across shard joins") {
    // 3-token docs, budget 4: doc k starts at offset 3k; shardWidth 2
    // forces the cross-shard base-offset path for every second doc
    val docs = (0L to 9L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = Curation.packSequences(docs, budget = 4, shardWidth = 2)
      .orderBy("doc_id").collect()
    out.map(_.getLong(2)).toSeq shouldBe (0L to 9L).map(_ * 3)
    // doc 1 spans tokens 3..5 -> seqs 0..1
    out(1).getLong(3) shouldBe 0L
    out(1).getLong(4) shouldBe 1L
    out(1).getLong(5) shouldBe 2L - 0L
    // doc 4 spans tokens 12..14 -> seq 3 only
    out(4).getLong(3) shouldBe 3L
    out(4).getLong(4) shouldBe 3L
    out(4).getLong(5) shouldBe 1L
  }

  test("packSequences is shard-width invariant: any sharding = sequential cumsum") {
    // irregular token counts (incl. a doc spanning many sequences) and
    // SPARSE doc_ids, so shard boundaries hit empty shards too
    val lens = Seq(3, 17, 1, 256, 9, 300, 2, 64, 128, 5)
    val ids = Seq(0L, 1L, 7L, 8L, 30L, 31L, 32L, 100L, 101L, 999L)
    val docs = ids.zip(lens)
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val expected = lens.scanLeft(0L)(_ + _).init // sequential exclusive prefix
    for (width <- Seq(1L, 3L, 16L, 64L, 10000L)) {
      val out = Curation.packSequences(docs, budget = 128, shardWidth = width)
        .orderBy("doc_id").collect()
      withClue(s"shardWidth=$width: ") {
        out.map(_.getLong(2)).toSeq shouldBe expected
        // seq span invariants hold row-wise
        out.foreach { r =>
          r.getLong(3) shouldBe r.getLong(2) / 128
          r.getLong(4) shouldBe (r.getLong(2) + r.getLong(1) - 1) / 128
        }
      }
    }
  }

  test("perSourceCap keeps the top-cap docs per source, doc_id breaks ties") {
    // quality is identical for same-text docs -> rank falls back to doc_id
    val docs = Seq(
      (1L, "s1", "the and is of to in a b c d"),
      (2L, "s1", "the and is of to in a b c d"),
      (3L, "s1", "x y z q w e r t y u"),
      (4L, "s2", "the and is of to in a b c d")).toDF("doc_id", "source", "text")
    val out = Curation.perSourceCap(docs, cap = 2)
      .orderBy("source", "rnk").collect()
    out.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq shouldBe
      Seq((1L, "s1", 1L), (2L, "s1", 2L), (4L, "s2", 1L))
    // stopword-free doc 3 ranks below the tied stopword-rich pair
    out.map(_.getLong(0)) should not contain 3L
  }

  test("vocabGrowth counts first occurrences per bucket, cumsum is the vocab") {
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), // bucket 0: types a, b, c
      (2L, "c d"), (3L, "d d")) // bucket 1: only d is new
      .toDF("doc_id", "text")
    val out = Curation.vocabGrowth(docs, bucketWidth = 2)
      .orderBy("bucket").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((0L, 3L, 3L), (1L, 1L, 4L))
  }

  test("mixtureWeights downsamples the over-represented stratum only") {
    // en: 6 tokens, de: 2 tokens -> total 8, target share 1/2 = 4 tokens
    val docs = Seq(
      (1L, "en", "a b c"), (2L, "en", "d e f"), (3L, "de", "g h"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.mixtureWeights(docs, "lang").orderBy("lang").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq(("de", 1L, 2L), ("en", 2L, 6L))
    out(0).getDouble(3) shouldBe 0.25 // de share
    out(0).getDouble(4) shouldBe 1.0  // under-represented: keep all
    out(1).getDouble(3) shouldBe 0.75
    out(1).getDouble(4) shouldBe math.rint(4.0 / 6.0 * 1e6) / 1e6
  }

  test("boilerplateRatio uses the exact permille df cut; zero-hit docs rate 0") {
    // 'x' in 3/4 docs (750‰), 'y' in 2/4 (500‰), 'z'/'w' in 1/4 (250‰)
    val docs = Seq(
      (1L, "x x y"), (2L, "x y"), (3L, "x z"), (4L, "w"))
      .toDF("doc_id", "text")
    val out = Curation.boilerplateRatio(docs, dfPermille = 500)
      .orderBy("doc_id").collect()
    // boiler vocab = {x, y} (>= 500‰ inclusive)
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq shouldBe Seq(
        (1L, 3L, 3L, 1.0), (2L, 2L, 2L, 1.0), (3L, 2L, 1L, 0.5), (4L, 1L, 0L, 0.0))
  }

  test("chunkWithOverlap: stride windows, clamped tail, shared overlap") {
    // 10 tokens, chunk 4, stride 3 → starts 0,3,6,9 → sizes 4,4,4,1
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.chunkWithOverlap(docs, chunkSize = 4, stride = 3)
      .orderBy("chunk_id").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    out.map(_.getLong(2)).toSeq shouldBe Seq(4L, 4L, 4L, 1L)
    // overlapping token t3 appears in chunk 0 (tail) and chunk 1 (head):
    // chunk fingerprints differ but both contain t3's text — check via
    // reconstruction of the chunk contents
    val md5c0 = out(0).getString(3)
    val md5c1 = out(1).getString(3)
    md5c0 should not be md5c1
    // a one-chunk doc: 3 tokens, chunk 4, stride 3 → exactly one chunk
    val one = Curation.chunkWithOverlap(
      Seq((2L, "a b c")).toDF("doc_id", "text"), 4, 3).collect()
    one.length shouldBe 1
    one.head.getLong(2) shouldBe 3L
  }

  test("piiScrub counts and redacts emails and digit runs") {
    val docs = Seq(
      (1L, "reach me at john.doe@example.com or 555123 ok"),
      (2L, "no pii here"),
      (3L, "a@b.c and x@y.zz plus 12 (too short) and 99999")).toDF("doc_id", "text")
    val out = Curation.piiScrub(docs).orderBy("doc_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 2L, 1L))
    // redaction is total: the fingerprints of scrubbed text with
    // different PII but same payload agree
    val same = Curation.piiScrub(Seq(
      (1L, "id 111222 mail a.one@host.com end"),
      (2L, "id 999888 mail b.two@other.org end")).toDF("doc_id", "text"))
      .select("redacted_md5").distinct().count()
    same shouldBe 1L
  }

  test("datasetCard aggregates per-source stats with deterministic top lang") {
    val docs = Seq(
      (1L, "a b c d", "en", "web"),
      (2L, "a b", "es", "web"),
      (3L, "a b c d e f", "en", "books"),
      (4L, "a b c d", "en", "web")).toDF("doc_id", "text", "lang", "source")
    val out = Curation.datasetCard(docs).orderBy("source").collect()
    val web = out.find(_.getString(0) == "web").get
    web.getLong(1) shouldBe 3L       // n_docs
    web.getLong(2) shouldBe 10L      // total tokens 4+2+4
    web.getString(6) shouldBe "en"   // top lang (2 en vs 1 es)
    web.getDouble(7) shouldBe math.rint(10.0 / 16.0 * 1e4) / 1e4
    val books = out.find(_.getString(0) == "books").get
    books.getLong(5) shouldBe 1L     // n_langs
    books.getDouble(4) shouldBe 6.0  // p50 of a single doc
  }

  test("bigramLogLoss: predictable word order scores lower than scrambled") {
    // doc 1 repeats the corpus-dominant bigram chain; doc 2 uses the
    // same unigrams in an order whose bigrams are corpus-rare
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "b b a a b a b b"),
      (3L, "a b a b"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Curation.bigramLogLoss(docs).orderBy("doc_id").collect()
    out.length shouldBe 4 // every doc has >= 2 tokens
    val byId = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byId(1L) should be < byId(2L)
    // one-bigram doc: loss is exactly -ln(0.7*P(b|a) + 0.3*P(b))
    val single = Curation.bigramLogLoss(Seq((9L, "x y")).toDF("doc_id", "text"))
      .collect().head.getDouble(1)
    // corpus of one doc: P(y|x) = 1, P(y) = 1/2 → -ln(0.7 + 0.15)
    single shouldBe math.rint(-math.log(0.85) * 1e4) / 1e4
    // sub-bigram docs drop out
    Curation.bigramLogLoss(Seq((9L, "solo")).toDF("doc_id", "text"))
      .count() shouldBe 0L
  }

  test("hashSplit: exhaustive, disjoint, append-stable, fraction-plausible") {
    val ids = (1L to 2000L).toDF("doc_id")
    val split = Curation.hashSplit(ids, "doc_id")
    // every row gets exactly one label
    split.count() shouldBe 2000L
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet shouldBe Set("train", "val", "test")
    counts.values.sum shouldBe 2000L
    // 800/100/100 permille within loose tolerance (hash, not rand)
    counts("train").toDouble / 2000 shouldBe 0.8 +- 0.05
    // APPEND STABILITY — the property randomSplit lacks: the assignment
    // of ids 1..2000 is identical when computed over a superset
    val sup = Curation.hashSplit((1L to 4000L).toDF("doc_id"), "doc_id")
      .filter($"doc_id" <= 2000)
    sup.except(split).count() shouldBe 0L
    split.except(sup).count() shouldBe 0L
  }

  test("splitLeakage surfaces exactly the near-dup pairs that cross splits") {
    val a = "the quick brown fox jumps over the lazy dog tonight"
    val b = "the quick brown fox jumps over the lazy cat tonight"
    // 40 docs: 20 near-dup pairs (i, i+100) spread over the id space so
    // some pairs land in the same split and some cross
    val docs = (1L to 20L).flatMap(i =>
      Seq((i * 7, a + s" tag$i"), (i * 7 + 100, b + s" tag$i")))
      .toDF("doc_id", "text")
    val tagged = Curation.hashSplit(docs, "doc_id", 300, 300)
    val expected = Dedup.lshNearDuplicates(docs)
      .join(tagged.select($"doc_id".as("doc_a"), $"split".as("split_a")), Seq("doc_a"))
      .join(tagged.select($"doc_id".as("doc_b"), $"split".as("split_b")), Seq("doc_b"))
      .filter($"split_a" =!= $"split_b")
      .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
      .collect().map(_.toString).sorted.toSeq
    val got = Dedup.splitLeakage(tagged)
      .collect().map(_.toString).sorted.toSeq
    got shouldBe expected
    expected should not be empty // the fixture must actually cross
    // and no returned pair shares a split
    Dedup.splitLeakage(tagged)
      .filter($"split_a" === $"split_b").count() shouldBe 0L
  }

  test("count shapes never key-partition a window (Zipf-hot keys aggregate first)") {
    // r21 computed the d22/d24/d44 corpus counts as COUNT WINDOWS over
    // the term / (w1,w2) key — a Zipf-hot key then owns one WindowExec
    // partition AQE cannot split (the r22 zipf ladder measured the
    // straggler growing with scale). The r22 shape aggregates first
    // (map-side partials collapse the hot key) and joins back — this
    // pin fails if a future edit reintroduces a key-partitioned window
    // anywhere in these operators' executed jobs. The final frames are
    // checkpoint-truncated, so the pin watches EVERY action's executed
    // plan through a QueryExecutionListener instead of the result plan.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.util.QueryExecutionListener
    val seen = new java.util.concurrent.CopyOnWriteArrayList[SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        seen.add(qe.executedPlan); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    def allOps(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => allOps(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allOps(q.plan)
        case _ => Nil
      }
      (p +: p.children.flatMap(allOps)) ++ nested
    }
    val docs = (1L to 60L).map(i =>
      (i, s"the quick fox w$i jumps over the lazy dog the end w${i % 7}"))
      .toDF("doc_id", "text")
    spark.listenerManager.register(listener)
    try {
      Curation.unigramLogLoss(docs).collect()
      Curation.topTfidfTermPerDoc(docs).collect()
      Curation.bigramLogLoss(docs).collect()
      // the execution listener delivers asynchronously; the plans under
      // test are registered within a bounded drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.size() < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val keyedWindows = seen.asScala.toSeq.flatMap(allOps).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty &&
            // d22's per-document rank window is allowed: doc_id
            // partitions are bounded by one document's distinct terms
            !w.partitionSpec.forall(_.references.map(_.name).forall(_ == "doc_id")) => w
      }
      val allWindows = seen.asScala.toSeq.flatMap(allOps).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      info(s"observed plans=${seen.size} windows=${allWindows.size} keyed=${keyedWindows.size}")
      allWindows should not be empty // the d22 doc_id rank window must be visible to the listener
      keyedWindows shouldBe empty
    } finally spark.listenerManager.unregister(listener)
  }
}
