package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Dedup

/** Scale probe: replicate the sf0.1 documents corpus `mult`× (ids
  * offset per replica, text perturbed with a replica-unique token so
  * replicas are near- but not exact duplicates) and time the flagship
  * dedup pipelines on the enlarged corpus. The point is empirical
  * evidence that the plans scale superlinearly-safely: candidate
  * generation stays bounded (band buckets, not all-pairs), shuffles
  * carry ids/hashes (not text), and wall-clock grows ~linearly in the
  * corpus. `runMain graft.ScaleProbe [sfDir] [mult]`. */
object ScaleProbe {

  /** A probe-run catalog over a WIPED warehouse dir: every probe rung
    * builds its tables from scratch, and a leftover warehouse from a
    * previous run would otherwise (a) trip watermark guards on
    * maintained tables (a re-run's createOrReplace is a non-append
    * commit under the old watermark) and (b) accumulate pre-replace
    * data files in /tmp forever (createOrReplace never GCs prior
    * versions). Wiping at the source fixes the whole class — no
    * per-table dropTable bookkeeping to forget. */
  private def freshCatalog(spark: SparkSession, path: String): graft.store.LakeCatalog = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    new graft.store.LakeCatalog(spark, path)
  }

  /** Zipf-skew rung for the d22/d24/d44 count shapes (r21 verdict:
    * the count-window rewrites put a Zipf-hot key through a WindowExec
    * partition AQE cannot split — prove or fix before claiming 100 TB).
    * Builds a synthetic corpus whose token frequencies follow ~1/rank
    * (rank = ⌊V^u⌋ with u hash-uniform — the classic inverse-CDF
    * draw for Zipf s=1: the hottest token owns ~1/ln V of ALL token
    * occurrences, ~6% at V=50k), times the skew-sensitive kernel both
    * ways at two decades — the COUNT WINDOW over the key vs the staged
    * groupBy+count join producing the identical integer — and prints
    * the max/median task skew of each run's worst stage, plus the real
    * operators (d22/d24/d44) for the end-to-end read.
    * `runMain graft.ScaleProbe <sfDir> zipf [mult]`. */
  private def zipfLadder(spark: SparkSession, sfDir: String, topMult: Int): Unit = {
    import graft.operators.Curation
    val par = spark.sparkContext.defaultParallelism

    // per-stage max/median task wall, to expose the single-straggler
    // shape wall-clock alone can hide at small rungs
    final case class St(var n: Int = 0, var maxMs: Long = 0L,
        var sumMs: Long = 0L, val all: scala.collection.mutable.ArrayBuffer[Long] =
          scala.collection.mutable.ArrayBuffer.empty)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val st = stages.computeIfAbsent(t.stageId, _ => St())
          st.synchronized {
            st.n += 1; st.sumMs += m.executorRunTime
            st.maxMs = math.max(st.maxMs, m.executorRunTime)
            st.all += m.executorRunTime
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def worstStage(): String = {
      import scala.jdk.CollectionConverters._
      stages.asScala.values.toSeq.sortBy(-_.maxMs).headOption.map { st =>
        val sorted = st.all.sorted
        val med = if (sorted.isEmpty) 0L else sorted(sorted.size / 2)
        f"worst stage: tasks=${st.n} max ${st.maxMs / 1e3}%.2f s median ${med / 1e3}%.2f s " +
          f"skew ${st.maxMs.toDouble / math.max(1L, med)}%.1f"
      }.getOrElse("no stages")
    }
    def timed(label: String)(body: => Unit): Double = {
      stages.clear()
      val t0 = System.nanoTime()
      body
      val w = (System.nanoTime() - t0) / 1e9
      println(f"PROBE zipf $label%-22s $w%8.2f s  (${worstStage()})")
      w
    }

    val mults = Seq(1, topMult)
    val walls = mults.map { mult =>
      val nDocs = 20000L * mult
      val toksPerDoc = 200
      val vocab = 50000
      // u = hash(doc,pos)/2^32 uniform in [0,1); rank = floor(V^u)
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          p => concat(lit("w"), floor(pow(lit(vocab.toDouble),
            pmod(xxhash64(col("id"), p), lit(1L << 32)).cast("double")
              / lit((1L << 32).toDouble))).cast("long")))).as("text"))
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = docs.count()
      println(s"PROBE zipf corpus x$mult: $total docs x $toksPerDoc tokens, V=$vocab")
      val toks = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toks.count()
      val hot = toks.groupBy("term").count().orderBy(desc("count")).limit(1).collect()(0)
      println(s"PROBE zipf hot token x$mult: ${hot.get(0)} owns ${hot.getLong(1)} of ${total * toksPerDoc}")
      // A: the r21 shape — count window over the hot-keyed partition
      val wWin = timed(s"ctf window     x$mult") {
        toks.withColumn("ctf",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
          .groupBy("doc_id").agg(sum("ctf").as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      // B: the fallback shape — groupBy+count joined back (identical
      // integer per row; AQE may broadcast or skew-split at will)
      val wJoin = timed(s"ctf group+join x$mult") {
        toks.join(toks.groupBy("term").agg(count(lit(1)).as("ctf")), Seq("term"))
          .groupBy("doc_id").agg(sum("ctf").as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      // the real operators end-to-end on the same skewed corpus
      val wD24 = timed(s"d24 unigram    x$mult") {
        Curation.unigramLogLoss(docs).write.format("noop").mode("overwrite").save()
      }
      val wD22 = timed(s"d22 tfidf      x$mult") {
        Curation.topTfidfTermPerDoc(docs).write.format("noop").mode("overwrite").save()
      }
      val wD44 = timed(s"d44 bigram     x$mult") {
        Curation.bigramLogLoss(docs).write.format("noop").mode("overwrite").save()
      }
      toks.unpersist()
      docs.unpersist()
      mult -> (wWin, wJoin, wD24, wD22, wD44)
    }
    walls.sliding(2).foreach {
      case Seq((m0, (a0, b0, c0, d0, e0)), (m1, (a1, b1, c1, d1, e1))) =>
        println(f"PROBE zipf ratio x$m0->x$m1 (${m1 / m0}x data): " +
          f"window ${a1 / a0}%.2f  group+join ${b1 / b0}%.2f  " +
          f"d24 ${c1 / c0}%.2f  d22 ${d1 / d0}%.2f  d44 ${e1 / e0}%.2f")
      case _ => ()
    }
  }

  /** Three-point decade ladder on the d35 flagship (the full
    * training-manifest composition): 1× / 10× / 100× the sf corpus,
    * same replica construction as the main probe. Two points (1×/10×)
    * can hide a superlinear term that only bends at the next decade;
    * the printed ratios make the curvature visible —
    * `runMain graft.ScaleProbe <sfDir> flagship`. */
  private def flagshipLadder(spark: SparkSession, sfDir: String): Unit = {
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      (if (i == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"$$1q${i}x")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val walls = Seq(1, 10, 100).map { mult =>
      val corpus = (0 until mult).map(replica).reduce(_ unionByName _)
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docs = corpus.count()
      val t0 = System.nanoTime()
      val rows = LlmQueries.trainingManifest(corpus).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBE d35_manifest x$mult%-4d $wall%8.2f s  ($docs docs -> $rows rows)")
      corpus.unpersist()
      mult -> wall
    }
    walls.sliding(2).foreach { case Seq((m0, w0), (m1, w1)) =>
      println(f"PROBE d35 ratio x$m0->x$m1: wall ${w1 / w0}%.2f for ${m1 / m0}x data")
    }
  }

  /** Three-point decade ladder on the PERSISTENT IVF INDEX's probe
    * (the e07/s19 steady state): build the index over a 1×/10×/100×
    * vector corpus and probe it with the SAME fixed ~200-query batch.
    * `nlist` scales WITH the corpus (replica-unique labels — the IVF
    * sizing rule: cells grow with N so per-cell size stays bounded;
    * a fixed nlist over 100× vectors would just make every cell 100×
    * heavier and the probe linear). The 100 TB claim under test:
    * per-probe cost = batch-vs-centroid assignment (broadcast,
    * map-side) + nprobe PRUNED cell partitions of ~constant size —
    * flat in corpus size. Append is O(batch) under the frozen
    * quantizer. `runMain graft.ScaleProbe <sfDir> ivf`. */
  private def ivfLadder(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.IvfIndex
    import graft.store.LakeCatalog
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // replica i: ids offset clear of every rung, vectors ADDITIVELY
    // perturbed on one component (near- but not exact duplicates of
    // replica 0 under COSINE — a multiplicative scale would be
    // cosine-invariant and make every replica an exact angular
    // duplicate, degenerating top-k into a vec_id tie-break), labels
    // replica-unique so the label-trained coarse quantizer's nlist
    // grows with the corpus
    def replica(i: Int): DataFrame = base.select(
      (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
      (if (i == 0) col("embedding")
       else transform(col("embedding"),
         (x, d) => x + when(d === 0, lit(i * 1e-3f)).otherwise(lit(0f)))).as("embedding"),
      (col("label") + lit(i * 10000)).as("label"))
    val probeBatch = base.filter(col("vec_id") < 200)
      .select((col("vec_id") + lit(2_000_000_000L)).as("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probeBatch.count()
    val walls = Seq(1, 10, 100).map { mult =>
      val corpus = (0 until mult).map(replica).reduce(_ unionByName _)
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vecs = corpus.count()
      val cat = freshCatalog(spark,
        s"${sys.props("java.io.tmpdir")}/graft_probe_ivf_$mult")
      cat.createDatabase("probe")
      val t0 = System.nanoTime()
      IvfIndex.build(cat, "probe", "ann", corpus)
      val buildWall = (System.nanoTime() - t0) / 1e9
      corpus.unpersist()
      val nlist = cat.table("probe.ann_centroids").read.count()
      val t1 = System.nanoTime()
      val rows = IvfIndex.query(cat, "probe", "ann", probeBatch, k = 5, nprobe = 3).count()
      val probeWall = (System.nanoTime() - t1) / 1e9
      // phase-attributed append: the wide-batch append touches ~min(batch,
      // nlist) cell leaves — one entry each — and the phase split below
      // shows where its wall goes (parquet write vs footer harvest vs
      // commit) at each rung
      graft.store.StoreTiming.enable()
      graft.store.StoreTiming.reset()
      val t2 = System.nanoTime()
      IvfIndex.appendBatch(cat, "probe", "ann", probeBatch, 1L)
      val appendWall = (System.nanoTime() - t2) / 1e9
      val phases = graft.store.StoreTiming.report().take(5)
        .map { case (p, n, sec) => f"$p $sec%.2f s×$n" }.mkString("  ")
      println(s"PROBE ivf append phases x$mult: $phases")
      // rebalance rung: full re-train + reassign over the whole index —
      // the maintenance pass whose N×nlist flat-assign term the
      // hierarchical dispatch exists to kill; moved count is printed so
      // the commit side (O(moved)) is visible separately from the
      // reassign compute
      val t3 = System.nanoTime()
      val movedN = IvfIndex.rebalance(cat, "probe", "ann")
      val rebalWall = (System.nanoTime() - t3) / 1e9
      println(f"PROBE ivf_index x$mult%-4d build $buildWall%8.2f s  probe $probeWall%8.2f s  " +
        f"append $appendWall%8.2f s  rebalance $rebalWall%8.2f s ($movedN moved)  " +
        f"($vecs vecs, $nlist cells, $rows neighbor rows)")
      // quality audit at the x10 AND x100 rungs: the same corpus
      // indexed through the EXACT flat assign (dispatch floor lifted),
      // probed with the same batch — neighbor-set recall of the
      // hierarchical index against the flat one measures, on MIXED
      // ladder data (not the spec's separated clusters), what the
      // two-level approximation actually costs, and x100 is where the
      // hierarchical path matters most (x1's 10 cells stay flat). The
      // super-group balance print alongside it guards the cost claim:
      // hash seeding + one Lloyd step can leave skewed groups, and a
      // dominant group degrades the assign back toward flat.
      if (mult == 10 || mult == 100) {
        val sizes = IvfIndex.assignGroupSizes(
          cat.table("probe.ann_centroids").read)
        println(f"PROBE ivf super-group balance x$mult: " +
          f"groups ${sizes.size}  max ${sizes.last}  " +
          f"median ${sizes(sizes.size / 2)}  " +
          f"skew ${sizes.last.toDouble / math.max(1L, sizes(sizes.size / 2))}%.1f")
      }
      if (mult == 10 || mult == 100) {
        // fresh indexes over the same corpus ("ann" was appended to and
        // rebalanced above, no longer comparable); one flat-assigned
        // reference, one hierarchical twin per probe width under audit
        val corpus2 = (0 until mult).map(replica).reduce(_ unionByName _)
          .repartition(par)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        IvfIndex.build(cat, "probe", "annflat", corpus2,
          flatMaxCells = Int.MaxValue)
        // the audit brackets the default (now 4) one width either side,
        // so the NEXT bump stays a MEASURED decision (the 2→3→4
        // pattern: adopt only if recall rises at zero build-wall cost)
        // — per-width build walls printed
        val probesAudit = Seq(3, 4, 5)
        val hierWalls = probesAudit.map { p =>
          val tB = System.nanoTime()
          IvfIndex.build(cat, "probe", s"annhier$p", corpus2,
            flatMaxCells = 0, groupProbes = p)
          p -> (System.nanoTime() - tB) / 1e9
        }.toMap
        corpus2.unpersist()
        val f = IvfIndex.query(cat, "probe", "annflat", probeBatch, k = 5, nprobe = 3)
          .select("query_id", "neighbor_id")
        val total = f.count()
        probesAudit.foreach { p =>
          val h = IvfIndex.query(cat, "probe", s"annhier$p", probeBatch, k = 5, nprobe = 3)
            .select("query_id", "neighbor_id")
          val common = h.join(f, Seq("query_id", "neighbor_id"), "left_semi").count()
          println(f"PROBE ivf two-level vs flat assign x$mult (groupProbes=$p): " +
            f"top-5 recall ${common.toDouble / total}%.3f ($common/$total neighbor slots)  " +
            f"build ${hierWalls(p)}%.2f s")
        }
      }
      mult -> (buildWall, probeWall, rebalWall)
    }
    walls.sliding(2).foreach { case Seq((m0, (b0, p0, r0)), (m1, (b1, p1, r1))) =>
      println(f"PROBE ivf ratio x$m0->x$m1: build ${b1 / b0}%.2f  probe ${p1 / p0}%.2f  " +
        f"rebalance ${r1 / r0}%.2f for ${m1 / m0}x corpus")
    }
  }

  /** Three-point decade ladder on the PERSISTENT LSH INDEX's probe
    * (the d51/s18 steady state): build the index over a 1×/10×/100×
    * history, then probe it with the SAME fixed ~500-doc batch. The
    * 100 TB claim under test is that probe cost is flat in history
    * size (one band join against the index + candidate-only Jaccard —
    * candidates are bucket-bounded, so a bigger history only adds
    * band rows the probe's keys never touch); build cost may grow
    * ~linearly (it sketches the history once, amortized over every
    * later probe). `runMain graft.ScaleProbe <sfDir> lsh`. */
  /** Fragmentation probe for the index-maintenance claim: stream 100
    * tiny append generations into one LSH index (100 commits → ~200
    * manifest entries + ~200 data files per table), time the fixed
    * probe against the FRAGMENTED index, compact, time it again. The
    * delta is the per-probe fragmentation tax — entry walking, file
    * opens, per-file footer reads — that interval compaction
    * (`compactEveryBatches`) exists to bound; on an object store the
    * per-file open is ~10-100× this local-FS cost.
    * `runMain graft.ScaleProbe <sfDir> lshfrag`. */
  private def lshFragProbe(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.LshIndex
    import graft.store.LakeCatalog
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val cat = freshCatalog(spark,
      s"${sys.props("java.io.tmpdir")}/graft_probe_lshfrag")
    cat.createDatabase("probe")
    LshIndex.build(cat, "probe", "nd", base.filter(col("doc_id") < 100))
    val t0 = System.nanoTime()
    (1 to 100).foreach { k =>
      LshIndex.appendBatch(cat, "probe", "nd",
        base.filter(col("doc_id") >= k * 100L && col("doc_id") < (k + 1) * 100L),
        k.toLong)
    }
    val appendWall = (System.nanoTime() - t0) / 1e9
    val probeBatch = base.filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(2_000_000_000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    def timeProbe(): (Double, Long) = {
      val t = System.nanoTime()
      val pairs = LshIndex.query(cat, "probe", "nd", probeBatch).count()
      ((System.nanoTime() - t) / 1e9, pairs)
    }
    def entries = cat.table("probe.nd_bands").currentSnapshot.get.entries.size
    val eFrag = entries
    val (fragWall, fragPairs) = timeProbe()
    val (fragWall2, _) = timeProbe() // second shot: warm plans, FS cache
    val tC = System.nanoTime()
    LshIndex.compact(cat, "probe", "nd")
    val compactWall = (System.nanoTime() - tC) / 1e9
    val eFolded = entries
    val (foldWall, foldPairs) = timeProbe()
    val (foldWall2, _) = timeProbe()
    require(foldPairs == fragPairs, s"compaction changed results: $foldPairs vs $fragPairs")
    println(f"PROBE lsh_frag 101 commits (append wall $appendWall%.1f s): " +
      f"probe@$eFrag-entries $fragWall%.2f/$fragWall2%.2f s -> compact $compactWall%.2f s " +
      f"-> probe@$eFolded-entries $foldWall%.2f/$foldWall2%.2f s  ($fragPairs pairs both)")
  }

  /** Decade ladder on the RETRACTION path (right-to-be-forgotten): at
    * 1×/10×/100× indexed history, fold the history (compact), land one
    * fixed ~500-doc recent batch, then `remove` half of it and time
    * the deletes. The 100 TB claim under test: retraction cost tracks
    * the entries that HOLD the removed documents, not the index — the
    * folded history's wide entries are dropped at planning time by
    * their doc_id bloom sidecars (r16: `_bands` blooms BOTH keys), so
    * removing recent docs rewrites ~the recent generation at every
    * rung. A second remove of ids the index never held isolates the
    * pure planning cost (zero rewrite). Fragmented-state retraction
    * cost is lshFragProbe's subject; this ladder pins the POST-FOLD
    * state the r15 verdict called out.
    * `runMain graft.ScaleProbe <sfDir> retract`. */
  /** Three-point decade ladder on the MoR READ path's delete reach:
    * a hash-mixed table (partition = doc_id mod 8 — every entry's key
    * RANGE spans the whole keyspace, the post-compaction shape) takes a
    * fresh equality delete confined to ONE partition's keys, and the
    * probe measures what the read pays, with a bloom-sidecar'd table
    * against a sidecar-less twin. The 100 TB claim under test: range
    * stats prove nothing here, so without sidecars EVERY entry pays the
    * masking anti-join until the next position-delete rewrite (and that
    * rewrite rewrites everything); with them, the maskable slice — and
    * the fold — is exactly the entries that hold doomed keys.
    * `runMain graft.ScaleProbe <sfDir> mor`. */
  private def morLadder(spark: SparkSession, sfDir: String): Unit = {
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      col("lang"), col("source"), col("n_chars"))
    val doomed = base.filter(col("doc_id") < 800 && pmod(col("doc_id"), lit(8L)) === 3L)
      .select("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    doomed.count()
    // the WIDE rung (x100 with a ~1 KB high-entropy payload per row —
    // ~0.5 GB of payload; the x10 width was still job-floor-bound):
    // at catalog-row widths the masked read's anti-join delta is noise
    // (~tens of ms), because the narrow columns decode for ~free — the
    // payload makes the scan the cost, so the bloom release (7/8 of the
    // data reading PLAIN instead of through the anti-join) shows in
    // seconds, the number a 100 TB design review asks for. 32 chained
    // md5 hexes ≈ 1 KB that parquet cannot compress away.
    val payload = concat_ws("", (0 until 32).map(i =>
      md5(concat(col("doc_id").cast("string"), lit(i.toString)))): _*)
    Seq((1, false), (10, false), (100, false), (100, true)).foreach { case (mult, wide) =>
      val narrow = (0 until mult).map(replica).reduce(_ unionByName _)
        .withColumn("grp", pmod(col("doc_id"), lit(8L)))
      val rows = (if (wide) narrow.withColumn("payload", payload) else narrow)
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = rows.count()
      val wh = s"${sys.props("java.io.tmpdir")}/graft_probe_mor_$mult${if (wide) "w" else ""}"
      val cat = freshCatalog(spark, wh)
      cat.createDatabase("probe")
      // bytes under one table's data root — the fold's REWRITTEN bytes
      // (dir growth across the fold: a rewrite lands new dirs, expiry
      // hasn't swept the old) are the hardware-independent number the
      // wall cannot show at NVMe-parallel sizes: the plain twin
      // rewrites the whole table, the sidecar'd twin the doomed slice
      def dataBytes(tbl: String): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$wh/probe/$tbl/data")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      }
      val out = Seq(true, false).map { blooms =>
        val t = cat.table(if (blooms) "probe.m_bloom" else "probe.m_plain")
        t.createOrReplace(rows, partitionBy = Seq("grp"),
          tableProperties =
            if (blooms) Map(
              "write.bloom.columns" -> "doc_id",
              "write.bloom.min-table-bytes" -> "0")
            else Map.empty)
        // fold to exactly one wide entry per partition (the shape a
        // compaction leaves behind)
        t.rewriteDataFiles()
        t.deleteWhereExistsMoR(doomed, Seq("doc_id"))
        val (maskable, total) = t.morMaskableCounts
        // first read pays the one-off delete-key collect + sidecar
        // loads; the repeat read plans from the verdict/key caches —
        // the steady state of a hot MoR table. The wide rung's scan
        // must DECODE the payload (a count() would prune it and hide
        // the whole point); sum(length) forces the column through.
        def scan(): Long =
          if (wide) t.read.agg(count(lit(1)), sum(length(col("payload"))))
            .head().getLong(0)
          else t.read.count()
        val t0 = System.nanoTime()
        val cnt = scan()
        val readWall = (System.nanoTime() - t0) / 1e9
        val t0b = System.nanoTime()
        scan()
        val rereadWall = (System.nanoTime() - t0b) / 1e9
        val tblName = if (blooms) "m_bloom" else "m_plain"
        val bytesBefore = dataBytes(tblName)
        val t1 = System.nanoTime()
        val (_, rewritten) = t.rewritePositionDeleteFiles()
        val foldWall = (System.nanoTime() - t1) / 1e9
        val foldMB = (dataBytes(tblName) - bytesBefore) / 1e6
        require(cnt == n - doomed.count(), s"MoR read lost rows: $cnt")
        (maskable, total, readWall, rereadWall, rewritten, foldWall, foldMB)
      }
      rows.unpersist()
      val (Seq(b, p)) = (out: @unchecked)
      println(f"PROBE mor_read${if (wide) "_WIDE" else ""} x$mult%-4d bloom: maskable ${b._1}/${b._2} " +
        f"read ${b._3}%6.2f/${b._4}%.2f s  fold-rewrote ${b._5} (${b._7}%.0f MB) in ${b._6}%6.2f s   " +
        f"plain: maskable ${p._1}/${p._2} read ${p._3}%6.2f/${p._4}%.2f s  " +
        f"fold-rewrote ${p._5} (${p._7}%.0f MB) in ${p._6}%6.2f s  ($n rows)")
    }
    doomed.unpersist()
    ()
  }

  private def retractLadder(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.LshIndex
    import graft.store.LakeCatalog
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      (if (i == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"$$1q${i}x")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val recent = base.filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(2_000_000_000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    recent.count()
    val walls = Seq(1, 10, 100).map { mult =>
      val history = (0 until mult).map(replica).reduce(_ unionByName _)
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docs = history.count()
      val cat = freshCatalog(spark,
        s"${sys.props("java.io.tmpdir")}/graft_probe_retract_$mult")
      cat.createDatabase("probe")
      // prune machinery live at any size: sidecars from the first
      // commit, tiny-rewrite short-circuit off
      LshIndex.build(cat, "probe", "nd", history, pruneMinBytes = 0L)
      Seq("probe.nd_bands", "probe.nd_toks").foreach(t =>
        cat.table(t).setProperties(
          Map(graft.store.LakeTable.TinyRewriteMaxBytesProp -> "0")))
      LshIndex.compact(cat, "probe", "nd")
      history.unpersist()
      LshIndex.appendBatch(cat, "probe", "nd", recent, 1L)
      val bandsT = cat.table("probe.nd_bands")
      val entriesTotal = bandsT.currentSnapshot.get.entries.size
      val t0 = System.nanoTime()
      LshIndex.remove(cat, "probe", "nd",
        recent.filter(col("doc_id") % 2 === 0).select("doc_id"))
      val removeWall = (System.nanoTime() - t0) / 1e9
      val rewritten = bandsT.currentSnapshot.get.summary("rewritten-entries").toInt
      val untouched = bandsT.currentSnapshot.get.summary("untouched-entries").toInt
      // replayed retraction of the SAME ids (idempotent GDPR replay):
      // the ids are INSIDE every entry's key range now, so only the
      // doc_id blooms can prove them gone — planning-only, zero rewrite
      val t1 = System.nanoTime()
      LshIndex.remove(cat, "probe", "nd",
        recent.filter(col("doc_id") % 2 === 0).select("doc_id"))
      val absentWall = (System.nanoTime() - t1) / 1e9
      val absentRewritten = bandsT.currentSnapshot.get.summary("rewritten-entries").toInt
      // the retracted docs are invisible to a follow-up probe
      val pairs = LshIndex.query(cat, "probe", "nd",
        base.filter(col("doc_id") < 100)
          .select((col("doc_id") + lit(2_100_000_000L)).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars")))
      require(pairs.filter(col("doc_b") % 2 === 0 && col("doc_b") >= 2_000_000_000L)
        .isEmpty, "removed docs resurfaced in a probe")
      println(f"PROBE lsh_retract x$mult%-4d remove $removeWall%8.2f s " +
        f"(bands rewrote $rewritten/$entriesTotal, untouched $untouched)  " +
        f"replay-remove $absentWall%8.2f s (rewrote $absentRewritten)  ($docs docs)")
      mult -> (removeWall, absentWall)
    }
    walls.sliding(2).foreach { case Seq((m0, (r0, a0)), (m1, (r1, a1))) =>
      println(f"PROBE retract ratio x$m0->x$m1: remove ${r1 / r0}%.2f  " +
        f"replay ${a1 / a0}%.2f for ${m1 / m0}x history")
    }
  }

  private def lshLadder(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.LshIndex
    import graft.store.LakeCatalog
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      (if (i == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"$$1q${i}x")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    // probe ids must clear EVERY replica range (replica i shifts by
    // i*10M, topping out at 990M + base ids at the x100 rung), or the
    // jaccard token-union would merge two documents under one id
    val probeBatch = base.filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(2_000_000_000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probeBatch.count()
    val walls = Seq(1, 10, 100).map { mult =>
      val history = (0 until mult).map(replica).reduce(_ unionByName _)
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docs = history.count()
      val cat = freshCatalog(spark,
        s"${sys.props("java.io.tmpdir")}/graft_probe_lsh_$mult")
      cat.createDatabase("probe")
      val t0 = System.nanoTime()
      LshIndex.build(cat, "probe", "nd", history)
      val buildWall = (System.nanoTime() - t0) / 1e9
      history.unpersist()
      val t1 = System.nanoTime()
      val pairs = LshIndex.query(cat, "probe", "nd", probeBatch).count()
      val probeWall = (System.nanoTime() - t1) / 1e9
      val plan = LshIndex.lastProbeStats.map(st =>
        if (st.tinyBypass) "tiny-bypass"
        else s"pruned bands ${st.bandEntriesPlanned}/${st.bandEntriesTotal}" +
          s" toks ${st.toksEntriesPlanned}/${st.toksEntriesTotal}").getOrElse("?")
      // second probe with the tiny-bypass floor disabled: times the
      // at-scale PRUNED plan on the same index (IN-list pushdown +
      // sidecar file skipping), so the rung reports both dispatches
      cat.table("probe.nd_bands").setProperties(
        Map(LshIndex.ProbePruneMinBytesProp -> "0"))
      val t2 = System.nanoTime()
      val pairsP = LshIndex.query(cat, "probe", "nd", probeBatch).count()
      val prunedWall = (System.nanoTime() - t2) / 1e9
      val planP = LshIndex.lastProbeStats.map(st =>
        s"bands ${st.bandEntriesPlanned}/${st.bandEntriesTotal}" +
          s" toks ${st.toksEntriesPlanned}/${st.toksEntriesTotal}").getOrElse("?")
      require(pairsP == pairs, s"pruned probe diverged: $pairsP vs $pairs")
      println(f"PROBE lsh_index x$mult%-4d build $buildWall%8.2f s  probe $probeWall%8.2f s  pruned-probe $prunedWall%8.2f s  ($docs docs, $pairs pairs, plan=$plan, pruned=$planP)")
      mult -> probeWall
    }
    walls.sliding(2).foreach { case Seq((m0, w0), (m1, w1)) =>
      println(f"PROBE lsh probe ratio x$m0->x$m1: wall ${w1 / w0}%.2f for ${m1 / m0}x history")
    }
  }

  /** Decade ladder on the s18 STREAMING steady state: index a
    * 1×/10×/100× history, then run THREE sequential ~500-doc
    * micro-batches through [[graft.streaming.IndexedDocStreams
    * .screenBatch]] — the FULL per-batch path (sketch once → probe the
    * index → dynamic-overwrite the pairs partition → append the batch's
    * signatures). The 100 TB claim under test: per-micro-batch wall is
    * flat in indexed-history size, because the probe is band-bucket-
    * bounded and the append is O(batch). Batch 1 at each rung also
    * absorbs the first-touch plan compile; batch 3 is the steady state
    * compared across rungs. `runMain graft.ScaleProbe <sfDir> stream`. */
  private def streamLadder(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.LshIndex
    import graft.store.LakeCatalog
    import graft.streaming.IndexedDocStreams
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      (if (i == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"$$1q${i}x")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    // micro-batch k: the same ~500 base docs (true near-dups of replica
    // 0 AND of every previously appended batch — constant pair work per
    // batch index, so rung-to-rung wall ratios isolate history size),
    // ids clear of every replica range and of each other
    def batch(k: Int): DataFrame = base.filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(2_000_000_000L + k * 1_000_000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val walls = Seq(1, 10, 100).map { mult =>
      val history = (0 until mult).map(replica).reduce(_ unionByName _)
        .repartition(par)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docs = history.count()
      val cat = freshCatalog(spark,
        s"${sys.props("java.io.tmpdir")}/graft_probe_stream_$mult")
      cat.createDatabase("probe")
      val outDir = s"${sys.props("java.io.tmpdir")}/graft_probe_stream_out_$mult"
      val t0 = System.nanoTime()
      LshIndex.build(cat, "probe", "nd", history)
      val buildWall = (System.nanoTime() - t0) / 1e9
      history.unpersist()
      val batchWalls = (1 to 3).map { k =>
        val t1 = System.nanoTime()
        IndexedDocStreams.screenBatch(cat, "probe", "nd", batch(k), k.toLong, outDir)
        (System.nanoTime() - t1) / 1e9
      }
      val pairs = spark.read.parquet(outDir).count()
      val plan = LshIndex.lastProbeStats.map(st =>
        if (st.tinyBypass) "tiny-bypass"
        else s"pruned bands ${st.bandEntriesPlanned}/${st.bandEntriesTotal}" +
          s" toks ${st.toksEntriesPlanned}/${st.toksEntriesTotal}").getOrElse("?")
      println(f"PROBE s18_screen x$mult%-4d build $buildWall%8.2f s  " +
        f"batches ${batchWalls.map(w => f"$w%.2f").mkString("/")} s  ($docs docs, $pairs pairs, plan=$plan)")
      mult -> batchWalls.last
    }
    walls.sliding(2).foreach { case Seq((m0, w0), (m1, w1)) =>
      println(f"PROBE s18 steady-batch ratio x$m0->x$m1: wall ${w1 / w0}%.2f for ${m1 / m0}x history")
    }
  }

  /** Interleaved A/B of the e22 lifecycle at `ivf.assign.group-probes`
    * 3 vs 4 — the harness that closed the r18 verdict's one `weak`
    * item (the p=4 default was adopted on ladder BUILD walls while the
    * bench head times build → append → rebalance → query). Probe width
    * is set EXPLICITLY at build (the property pins, so append and
    * rebalance inherit it); p values are INTERLEAVED rep by rep so a
    * host phase shift hits both arms equally; rep 1 carries plan
    * compile (the bench head's shape), reps 2+ are steady state.
    * Verdict (r19, two brackets on different host phases): steady
    * totals overlap completely, rebalance moved the same vectors at
    * both widths — the knob is exonerated, host phase + first-run plan
    * compile explain the bench residual.
    * `runMain graft.ScaleProbe <sfDir> e22bracket [reps]`. */
  private def e22Bracket(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    import graft.operators.IvfIndex
    val emb = SparkEntry.table(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()

    def lifecycle(p: Int, rep: Int): Map[String, Double] = {
      val tag = s"e22brkt_p${p}_r$rep"
      val wh = s"${sys.props("java.io.tmpdir")}/graft_warehouse_$tag"
      val cat = freshCatalog(spark, wh)
      cat.createDatabase("lake")
      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (_, tb) = timed(IvfIndex.build(cat, "lake", "annrb",
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 400), groupProbes = p))
      val (_, ta) = timed(IvfIndex.append(cat, "lake", "annrb",
        emb.filter(col("vec_id") >= 400)))
      val (moved, tr) = timed(IvfIndex.rebalance(cat, "lake", "annrb"))
      val (n, tq) = timed(IvfIndex
        .query(cat, "lake", "annrb", emb.filter(col("vec_id") < 5), k = 5, nprobe = 3)
        .orderBy("query_id", "rank")
        .write.format("noop").mode("overwrite").save())
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh), true)
      val _ = n
      Map("build" -> tb, "append" -> ta, "rebalance" -> tr, "query" -> tq,
        "total" -> (tb + ta + tr + tq), "moved" -> moved.toDouble)
    }

    def r2(d: Double) = math.rint(d * 100) / 100
    val rows = for (rep <- 1 to reps; p <- Seq(3, 4)) yield {
      val m = lifecycle(p, rep)
      println(s"""{"probe":"e22-bracket","rep":$rep,"p":$p,""" +
        s""""build":${r2(m("build"))},"append":${r2(m("append"))},""" +
        s""""rebalance":${r2(m("rebalance"))},"query":${r2(m("query"))},""" +
        s""""total":${r2(m("total"))},"moved":${m("moved").toLong}}""")
      (p, rep, m)
    }
    val steady = rows.filter(_._2 > 1)
    def med(xs: Seq[Double]) = {
      val s = xs.sorted; if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    Seq(3, 4).foreach { p =>
      val t = steady.collect { case (`p`, _, m) => m("total") }
      val a = steady.collect { case (`p`, _, m) => m("rebalance") + m("append") }
      println(s"""{"probe":"e22-bracket-summary","p":$p,""" +
        s""""steady_total_med":${r2(med(t))},"steady_assign_med":${r2(med(a))}}""")
    }
  }

  /** Phase-attributed IVF BUILD wall at ladder scale (the ladder only
    * phase-instruments the append): `mult` perturbed replicas,
    * nlist scaled as in the ladder, cells table partitioned by cell
    * with bloom sidecars. Used to adjudicate ladder build-wall
    * outliers — r19's 170 s x100 reading decomposed to 16.9 s
    * standalone (14.7 s parquet-write, 0.08 s post-write listing),
    * i.e. host/context, not code.
    * `runMain graft.ScaleProbe <sfDir> ivfbuild [mult]`. */
  private def ivfBuildProbe(spark: SparkSession, sfDir: String, mult: Int): Unit = {
    import graft.operators.IvfIndex
    import graft.store.StoreTiming
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def replica(i: Int): DataFrame = base.select(
      (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
      (if (i == 0) col("embedding")
       else transform(col("embedding"),
         (x, d) => x + when(d === 0, lit(i * 1e-3f)).otherwise(lit(0f)))).as("embedding"),
      (col("label") + lit(i * 10000)).as("label"))
    val corpus = (0 until mult).map(replica).reduce(_ unionByName _)
      .repartition(par)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus rows: ${corpus.count()}")
    val wh = s"${sys.props("java.io.tmpdir")}/graft_probe_ivfbuild_$mult"
    val cat = freshCatalog(spark, wh)
    cat.createDatabase("probe")
    StoreTiming.enable()
    StoreTiming.reset()
    val t0 = System.nanoTime()
    IvfIndex.build(cat, "probe", "ann", corpus)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PROBE ivf_build x$mult wall $wall%.2f s")
    StoreTiming.report().foreach { case (p, n, sec) =>
      println(f"  PHASE $p%-28s calls=$n%-4d total=$sec%8.2f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.drop(1).headOption.contains("e22bracket")) {
      e22Bracket(spark, sfDir, args.drop(2).headOption.map(_.toInt).getOrElse(3))
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("ivfbuild")) {
      ivfBuildProbe(spark, sfDir, args.drop(2).headOption.map(_.toInt).getOrElse(100))
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("zipf")) {
      zipfLadder(spark, sfDir, args.drop(2).headOption.map(_.toInt).getOrElse(10))
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("flagship")) {
      flagshipLadder(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("lsh")) {
      lshLadder(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("ivf")) {
      ivfLadder(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("lshfrag")) {
      lshFragProbe(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("retract")) {
      retractLadder(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("mor")) {
      morLadder(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("stream")) {
      streamLadder(spark, sfDir)
      spark.stop()
      return
    }
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val par = spark.sparkContext.defaultParallelism

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = base.count()
    // every TOKEN gets a replica-unique suffix — a true bijection on the
    // vocabulary (no collisions, no case-normalization collapse), so the
    // near-dup structure WITHIN a replica is preserved exactly while
    // replicas share zero tokens: duplicate density stays constant as
    // the corpus grows and wall-clock measures scaling, not a synthetic
    // pair explosion. Works for any mult.
    def replica(i: Int): DataFrame = base.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      (if (i == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"$$1q${i}x")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val big = (0 until mult).map(replica).reduce(_ unionByName _)
      .repartition(par)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"PROBE corpus: ${big.count()} docs (${n} x $mult)")

    // one timing helper for the whole probe: generic body, row-count
    // suffix when the timed work returns one
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      val suffix = a match { case n: Long => s"  ($n rows)"; case _ => "" }
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s$suffix")
      a
    }
    def time(name: String)(df: => DataFrame): Unit = { timed(name)(df.count()); () }
    time("exact_groups")(Dedup.exactGroups(big))
    time("lsh_near_dup")(Dedup.lshNearDuplicates(big, maxBucket = 1000))
    time("dup_ngram_coverage")(Dedup.dupNgramCoverage(big))
    // d54: the actionable form of the coverage score — non-owner
    // occurrences of corpus-duplicated spans removed, text rebuilt.
    // Replicas share zero tokens, so duplicated-span density is
    // constant as the corpus grows: wall must track ~the corpus (one
    // token-stage pass + hash-keyed shuffles), never all-pairs.
    time("substring_dedup (d54)")(Dedup.exactSubstringDedup(big))
    time("simhash_near_dup")(Dedup.simhashNearDuplicates(big))

    // ANN probes (the e04/e07/e19 IVF family): corpus replicated with
    // id offsets — per-cell population grows `mult`×, and the claim
    // under test is that candidate generation stays cell-bounded (query
    // cost ~linear in corpus, never all-pairs) while index build is a
    // one-shuffle assignment. Queries stay FIXED (25 vectors) so probe
    // wall-clock isolates corpus growth.
    import graft.operators.{IvfIndex, Similarity}
    import graft.store.LakeCatalog
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def embReplica(i: Int): DataFrame = embBase.select(
      (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
      col("embedding"), col("label"))
    val embBig = (0 until mult).map(embReplica).reduce(_ unionByName _)
      .repartition(par)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = embBase.filter(col("vec_id") < 25)
    println(s"PROBE embeddings: ${embBig.count()} vectors x ${queries.count()} queries")

    time("ivf_knn_derive (e04)")(
      Similarity.ivfKnn(queries, embBig, k = 5, nprobe = 3))
    val cat = freshCatalog(spark,
      s"${sys.props("java.io.tmpdir")}/graft_probe_ivf_$mult")
    cat.createDatabase("probe")
    time("ivf_index_build (e07)") {
      IvfIndex.build(cat, "probe", "ann", embBig)
      cat.table("probe.ann_cells").read
    }
    time("ivf_index_query (e07)")(
      IvfIndex.query(cat, "probe", "ann", queries, k = 5, nprobe = 3))
    time("ivf_index_append (e19)") {
      // one replica's worth of fresh vectors against the frozen quantizer
      IvfIndex.append(cat, "probe", "ann", embReplica(mult))
      cat.table("probe.ann_cells").read
    }
    time("ivf_query_after_append")(
      IvfIndex.query(cat, "probe", "ann", queries, k = 5, nprobe = 3))
    time("ivf_rebalance (e22)") {
      // re-train centroids from current assignments, move only the
      // vectors whose cell changed — cost must track MOVED vectors
      val moved = IvfIndex.rebalance(cat, "probe", "ann")
      println(s"    [rebalance moved $moved vectors]")
      cat.table("probe.ann_cells").read
    }

    // Store probe: copy-on-write vs merge-on-read MERGE on a `mult`×
    // table, same 1%-of-base micro-batch. The claim under test is the
    // MoR write contract: COW merge cost tracks the table slice it
    // rewrites, MoR commit cost tracks only the batch — the gap is what
    // a heavy-update CDC table buys at 100 TB. Compaction then pays the
    // folded cost once, off the ingest path.
    val storeCat = freshCatalog(spark,
      s"${sys.props("java.io.tmpdir")}/graft_probe_store_$mult")
    storeCat.createDatabase("probe")
    val docTable = big.select(col("doc_id"), col("source"), col("n_chars"))
    val batch = docTable.filter(col("doc_id") % 100 === 7)
      .withColumn("n_chars", col("n_chars") + 1)
    val cow = storeCat.table("probe.docs_cow")
    cow.createOrReplace(docTable)
    timed("cow_merge")(cow.mergeInto(batch, Seq("doc_id")))
    val mor = storeCat.table("probe.docs_mor")
    mor.createOrReplace(docTable)
    timed("mor_merge")(mor.mergeIntoMoR(batch, Seq("doc_id")))
    timed("mor_masked_read")(mor.read.write.format("noop").mode("overwrite").save())
    timed("mor_compaction")(mor.rewritePositionDeleteFiles())

    // Stats-pruned MoR read: ingest as `mult` ranged appends (one entry
    // per append, disjoint doc_id ranges), then delete keys confined to
    // the NEWEST range. morRead's manifest-stats pruning must confine
    // the anti-join to that one entry — every older entry reads plain —
    // so the masked read costs ~a plain scan regardless of how many
    // delete-free entries the table holds (the 100 TB shape: deletes
    // land in recent partitions, history stays untaxed).
    def docReplica(i: Int) = replica(i)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ranged = storeCat.table("probe.docs_ranged")
    ranged.createOrReplace(docReplica(0))
    (1 until mult).foreach(i => ranged.append(docReplica(i)))
    timed("ranged_plain_read")(
      ranged.read.write.format("noop").mode("overwrite").save())
    timed("mor_ranged_delete")(ranged.deleteWhereExistsMoR(
      docReplica(mult - 1).filter(col("doc_id") % 100 === 7).select("doc_id"),
      Seq("doc_id")))
    timed("mor_pruned_read")(
      ranged.read.write.format("noop").mode("overwrite").save())

    // Incremental rollup maintenance (c30/c33 machinery) on the ranged
    // table's shape: bootstrap aggregates the whole corpus once; then a
    // FIXED-size append folds in O(increment), and a FIXED-size MoR
    // delete folds as a negative delta whose removedChanges scan is
    // confined by manifest stats to the one entry the delete keys can
    // reach. Both refreshes must stay ~flat as `mult` grows while the
    // bootstrap scales with the corpus — the maintenance-vs-rebuild gap
    // every 100 TB ledger rollup lives on.
    {
      import graft.operators.Rollup
      val ruSrc = storeCat.table("probe.docs_rusrc")
      ruSrc.createOrReplace(docReplica(0))
      (1 until mult).foreach(i => ruSrc.append(docReplica(i)))
      val ruDst = storeCat.table("probe.docs_rollup")
      timed("rollup_bootstrap")(
        Rollup.refresh(ruSrc, ruDst, Seq("source"), Seq("n_chars")))
      timed("rollup_append_fold") {
        ruSrc.append(docReplica(0)
          .filter(col("doc_id") < 500)
          .withColumn("doc_id", col("doc_id") + lit(2_000_000_000L)))
        Rollup.refresh(ruSrc, ruDst, Seq("source"), Seq("n_chars"))
      }
      timed("rollup_mor_fold") {
        ruSrc.deleteWhereExistsMoR(
          docReplica(0).filter(col("doc_id") < 500).select("doc_id"),
          Seq("doc_id"))
        Rollup.refresh(ruSrc, ruDst, Seq("source"), Seq("n_chars"))
      }
    }

    // MoR-extrema rollup (c35/c40 machinery): MAX is non-invertible
    // under deletes, so the refresh re-aggregates the touched groups
    // from the SOURCE — the touched-key pruning must confine that scan
    // to entries whose stats can contain the touched groups. Source =
    // `mult` ranged appends with a range-aligned group column (one
    // `grp` value per entry); delete keys confined to the NEWEST range
    // ⇒ the re-agg plans ~1 entry no matter how many ranges the table
    // holds (the 100 TB shape: churn lands in recent partitions, the
    // extrema re-agg never re-reads cold history).
    {
      import graft.operators.Rollup
      def grpReplica(i: Int) = docReplica(i).withColumn("grp", lit(i))
      val exSrc = storeCat.table("probe.docs_exsrc")
      exSrc.createOrReplace(grpReplica(0))
      (1 until mult).foreach(i => exSrc.append(grpReplica(i)))
      val exDst = storeCat.table("probe.docs_exrollup")
      timed("extrema_bootstrap")(
        Rollup.refresh(exSrc, exDst, Seq("grp"), Seq("n_chars"),
          maxCols = Seq("n_chars")))
      timed("extrema_mor_fold") {
        exSrc.deleteWhereExistsMoR(
          grpReplica(mult - 1).filter(col("doc_id") % 100 === 7)
            .select("doc_id"),
          Seq("doc_id"))
        Rollup.refresh(exSrc, exDst, Seq("grp"), Seq("n_chars"),
          maxCols = Seq("n_chars"))
      }
      // plan-level evidence, same predicate shape the refresh inlined
      val planned = exSrc.prunedEntries(exSrc.currentSnapshot.get,
        col("grp").isInCollection(Seq(mult - 1))).size
      println(s"    [extrema re-agg plans $planned of >=$mult entries]")
    }

    // Bloom-sidecar point lookup: `bloomK` INTERLEAVED appends (every
    // entry spans the full doc_id range, so min/max stats prune
    // nothing), then a single-key readWhere. With write.bloom.columns
    // the lookup plans ~1 entry after KB-sized sidecar reads; the
    // control table without blooms must open every entry. The gap is
    // the 100 TB PK-lookup story: sidecar IO is per-probed-entry,
    // data IO per-match — neither grows with the table.
    val bloomK = 8
    val bloomed = storeCat.table("probe.docs_bloomed")
    val plainT = storeCat.table("probe.docs_plain")
    def slice(i: Int) = docTable.filter(col("doc_id") % bloomK === i)
    timed("bloom_ingest") {
      bloomed.createOrReplace(slice(0), tableProperties = Map(
        "write.bloom.columns" -> "doc_id"))
      (1 until bloomK).foreach(i => bloomed.append(slice(i)))
    }
    plainT.createOrReplace(slice(0))
    (1 until bloomK).foreach(i => plainT.append(slice(i)))
    val probeKey = 4243L // lives in exactly one slice
    val bloomPlanned = bloomed
      .prunedEntries(bloomed.currentSnapshot.get, col("doc_id") === probeKey).size
    val plainPlanned = plainT
      .prunedEntries(plainT.currentSnapshot.get, col("doc_id") === probeKey).size
    println(s"    [bloom plans $bloomPlanned / $bloomK entries; control plans $plainPlanned]")
    timed("bloom_point_lookup")(bloomed.readWhere(col("doc_id") === probeKey).count())
    timed("plain_point_lookup")(plainT.readWhere(col("doc_id") === probeKey).count())

    // Persistent LSH index (d51) vs one-shot incremental near-dup
    // (d47) on a FIXED ~500-doc probe batch: the index sketches history
    // once at build, so probe cost must stay ~flat as history grows;
    // the one-shot operator re-tokenizes and re-sketches ALL history
    // per batch and grows with the corpus — the gap is the per-micro-
    // batch cost a 100 TB near-dup screen pays without the index.
    import graft.operators.LshIndex
    val probeBatch = base.filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(2_000_000_000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    timed("lsh_index_build")(LshIndex.build(storeCat, "probe", "nd", big))
    timed("lsh_index_probe")(
      LshIndex.query(storeCat, "probe", "nd", probeBatch).count())
    timed("lsh_oneshot_probe")(
      Dedup.incrementalNearDuplicates(probeBatch, big).count())
    spark.stop()
  }
}
