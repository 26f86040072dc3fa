package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication for training-data pipelines, at lake scale.
  *
  * Pipeline shapes (all operate on a `documents(doc_id, text, ...)` table):
  *
  *  - exact:   fingerprint → groupBy(fingerprint) → keep min doc_id.
  *             One shuffle on a 32-byte key; at 100 TB this is the cheap
  *             first pass that typically removes the bulk of duplicates.
  *  - minhash+LSH: per-row signature (map-side only) → explode band keys →
  *             self-join on band key carrying ONLY (band, doc_id) →
  *             distinct on the id pair → join the token sets back once →
  *             exact Jaccard verify. The shuffle never carries token
  *             arrays through the band join or the pair-distinct, and a
  *             `maxBucket` guard (groupBy-count, no per-band window sort)
  *             drops degenerate boilerplate buckets the way production
  *             dedup jobs do.
  *  - blocked: same LSH candidate generation CONFINED to a blocking key
  *             (e.g. source) — candidates must share block AND band, so a
  *             popular block costs bucketed-LSH work, never O(n²/block).
  *  - simhash: 16-bit signature per row; hamming-distance near-dup join
  *             bucketed by the signature (distance 0) or rotated masks
  *             (k>0).
  *
  * PERF: every stage materializes its array intermediate (`__toks`,
  * `__shingles`) in its own projection before the next stage's
  * higher-order functions consume it — HOF lambdas re-evaluate captured
  * subtrees per element, so feeding them attributes instead of
  * expression trees is the difference between O(rows) and
  * O(rows × tokens × k) regex/hash work (measured 10×+ on the bench).
  */
object Dedup {

  /** Materialize `out` (eager localCheckpoint — computes and stores the
    * compact result, cutting lineage) and then release every staged
    * frame the pipeline persisted. Without this, repeated operator
    * invocations in a long-lived session accumulate cached token/band
    * blocks indefinitely; with it, the only retained blocks are the
    * small result partitions, freed by the ContextCleaner once the
    * caller drops the DataFrame. */
  private[operators] def releasing(out: DataFrame, staged: DataFrame*): DataFrame = {
    val r = out.localCheckpoint(true)
    staged.foreach(_.unpersist(false))
    r
  }

  /** Exact dedup groups: one row per fingerprint with the surviving
    * (minimum) doc id and the group size. */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", md5(normalizeAggressive(col(textCol))))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_docs"))

  /** Surviving rows after exact dedup (keep lowest doc_id per fingerprint). */
  def exactDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fp").orderBy(col("doc_id"))
    docs
      .withColumn("fp", md5(normalizeAggressive(col(textCol))))
      .withColumn("__row", row_number().over(w))
      .filter(col("__row") === 1)
      .drop("__row", "fp")
  }

  /** Incremental exact dedup — the production shape: a new batch dedups
    * against the FULL history by anti-joining the historical fingerprint
    * store (32-byte keys only, never text), then keeps the first row per
    * fingerprint within the batch. At 100 TB of history the cost is one
    * key join (broadcast when the batch's fp set is small, shuffled
    * hash-join otherwise — AQE decides) plus one window over the batch;
    * history text is never read. */
  def incrementalDedup(
      incoming: DataFrame,
      knownFps: DataFrame,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fp").orderBy(col("doc_id"))
    incoming
      .withColumn("fp", md5(normalizeAggressive(col(textCol))))
      .join(knownFps.select("fp"), Seq("fp"), "left_anti")
      .withColumn("__row", row_number().over(w))
      .filter(col("__row") === 1)
      .drop("__row", "fp")
  }

  /** Fingerprint projection for the historical store side of
    * incrementalDedup. */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(md5(normalizeAggressive(col(textCol))).as("fp")).distinct()

  /** Bloom-accelerated incremental dedup — same result as
    * [[incrementalDedup]], different scale shape: the history
    * fingerprint store is reduced to a KB–MB bloom sketch over 60-bit
    * md5-prefix keys and probed MAP-SIDE on the incoming scan. Docs the
    * sketch proves unseen (no false negatives) bypass the history
    * anti-join entirely; only the might-dup fraction — true duplicates
    * plus the configured fpp of false positives — shuffles into the
    * exact anti-join that settles them. At 100 TB, where the incoming
    * batch is huge and the duplicate fraction small, the anti-join's
    * probe side shrinks from the whole batch to roughly that fraction;
    * the in-batch keep-first window is unchanged, so the result is
    * bit-identical to the plain incremental path. */
  def bloomIncrementalDedup(
      incoming: DataFrame,
      knownFps: DataFrame,
      textCol: String = "text",
      fpp: Double = 0.01): DataFrame = {
    val (out, staged) = bloomIncrementalDedupPlan(incoming, knownFps, textCol, fpp)
    if (staged.isEmpty) out else releasing(out, staged: _*)
  }

  /** The LAZY pipeline behind [[bloomIncrementalDedup]] plus the staged
    * frames the caller must release after consuming it — exposed
    * private[graft] so plan-shape specs can inspect the probe/anti-join
    * layout (the public method materializes eagerly, which truncates
    * the observable plan to the checkpointed result). */
  private[graft] def bloomIncrementalDedupPlan(
      incoming: DataFrame,
      knownFps: DataFrame,
      textCol: String = "text",
      fpp: Double = 0.01): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.BloomMightContain
    def fpLong(fp: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(fp, 1, 15), 16, 10).cast("long")
    val histKeys = knownFps.select(fpLong(col("fp")).as("fpl"))
    histKeys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // fingerprint-store contract: knownFps is already distinct, so the
      // count sizes the filter on unique keys; a non-distinct caller only
      // over-sizes it (fpp still honored). Empty history: the sketch and
      // the persist cycle are pure overhead — the plain incremental path
      // is the same plan minus both extra jobs.
      val nHist = histKeys.count()
      if (nHist == 0L) (incrementalDedup(incoming, knownFps, textCol), Nil)
      else {
        val bytes =
          BloomMightContain.buildFilterBytes(histKeys, "fpl", nHist, fpp)
        // staged once: the definitely-new and might-dup branches both
        // consume it, and unpersisted each branch re-runs the full
        // normalize+md5 pass over the incoming text (Catalyst plans
        // common subtrees per consumer)
        val staged = incoming
          .withColumn("fp", md5(normalizeAggressive(col(textCol))))
          .withColumn("__might",
            BloomMightContain.mightContain(fpLong(col("fp")), bytes))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val defNew = staged.filter(!col("__might"))
        val confirmedNew = staged.filter(col("__might"))
          .join(knownFps.select("fp"), Seq("fp"), "left_anti")
        val w = Window.partitionBy("fp").orderBy(col("doc_id"))
        (defNew.unionByName(confirmedNew)
          .withColumn("__row", row_number().over(w))
          .filter(col("__row") === 1)
          .drop("__row", "__might", "fp"),
          Seq(staged))
      }
    } finally { histKeys.unpersist(false); () }
  }

  /** Per-doc minhash signature (k hashes over word n-gram shingles),
    * staged tokens → shingles → signature, one projection each. */
  def minhashSignatures(
      docs: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .filter(size(col("__toks")) >= shingleSize)
      .withColumn("__shingles", shinglesFromTokens(col("__toks"), shingleSize))
      .withColumn("sig", minhashSignature(col("__shingles"), k))
      .drop("__toks", "__shingles")

  /** (doc_id[, block], __toks) staged ONCE and persisted: the signature
    * pipeline and the Jaccard verify both read this frame, so the corpus
    * text is regex-tokenized exactly once per dedup run instead of once
    * per consumer (previously the verify-side token join re-ran the full
    * tokenize pass — an extra corpus scan at any scale). The cached
    * payload is ids + token arrays, MEMORY_AND_DISK so oversized corpora
    * spill to local disk instead of OOMing executors. */
  private[operators] def tokenStage(
      docs: DataFrame,
      textCol: String,
      blockCol: Option[String]): DataFrame = {
    val keyCols = blockCol.toSeq :+ "doc_id"
    docs
      .select(keyCols.map(col) :+ tokens(col(textCol)).as("__toks"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Signature pipeline over a pre-tokenized stage (see tokenStage):
    * each shingle is md5-hashed ONCE (60-bit prefix), then all k
    * minhashes come from `graft_minhash_sketch`'s single fused native
    * pass — versus k seeded md5 evaluations per shingle in the
    * composable form (the layout change measured ~20× on char grams;
    * word shingles are ~10× sparser but the same shape wins). */
  private def signaturesFromStage(staged: DataFrame, shingleSize: Int, k: Int): DataFrame =
    staged
      .filter(size(col("__toks")) >= shingleSize)
      .withColumn("__sh", shingleMd5Longs(col("__toks"), shingleSize, 15))
      .withColumn("sig", minhashSketch(col("__sh"), k))
      .drop("__toks", "__sh")

  /** (band, doc_id[, blockCol]) exploded band keys with oversized buckets
    * dropped — only ids travel through the downstream self-join. */
  private[operators] def bandedIds(
      staged: DataFrame,
      shingleSize: Int,
      k: Int,
      bands: Int,
      maxBucket: Int,
      blockCol: Option[String]): DataFrame = {
    val keyCols = blockCol.toSeq :+ "doc_id"
    val banded = signaturesFromStage(staged, shingleSize, k)
      .withColumn("band", explode(lshBands(col("sig"), bands, k / bands)))
      .select((("band" +: keyCols).map(col)): _*)
    // bucket-size guard as groupBy-count + join: no per-band sort, and
    // the (band, count) side is small enough for a broadcast at any SF
    val keep = banded.groupBy("band").count()
      .filter(col("count") <= maxBucket).select("band")
    // persist: the caller self-joins this frame, and without
    // materialization BOTH join sides recompute the whole signature
    // pipeline (shingles + k×md5 per doc). The cached payload is only
    // (band, ids) — compact at any corpus size.
    banded.join(keep, Seq("band"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private[operators] def jaccardOnPairs(pairs: DataFrame, docToks: DataFrame, threshold: Double): DataFrame =
    pairs
      .join(docToks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")), Seq("doc_a"))
      .join(docToks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)

  /** LSH candidate pairs (doc_a < doc_b) that share at least one band,
    * verified with exact token-set Jaccard ≥ `threshold`.
    *
    * Scale shape: the band self-join and the pair-level `distinct`
    * shuffle only ids; the (bounded) candidate set then joins the token
    * sets back exactly once for the verify. `maxBucket` caps pathological
    * buckets (boilerplate shared by thousands of docs) whose pair
    * expansion would be quadratic. */
  def lshNearDuplicates(
      docs: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val staged = tokenStage(docs, textCol, None)
    val pruned = bandedIds(staged, shingleSize, k, bands, maxBucket, None)
    val pairs = pruned.select(col("band"), col("doc_id").as("doc_a"))
      .join(pruned.select(col("band"), col("doc_id").as("doc_b")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val docToks = staged.select(col("doc_id"),
      array_distinct(col("__toks")).as("toks"))
    releasing(
      jaccardOnPairs(pairs, docToks, threshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")),
      staged, pruned)
  }

  /** SPLIT-LEAKAGE audit: LSH near-dup pairs that CROSS a train/val/
    * test boundary — the generalization of exact/n-gram contamination
    * (d20/d25) to near-duplicates. A test document whose near-twin sits
    * in train inflates every eval metric; this surfaces exactly those
    * pairs, with both split labels, so the pipeline can quarantine one
    * side before training. Cost: the banded near-dup pipeline plus an
    * id-only join against the split tags — the tags ride a map-side
    * projection ([[Curation.hashSplit]]), never a shuffle of text. */
  def splitLeakage(
      taggedDocs: DataFrame,
      splitCol: String = "split",
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val tags = taggedDocs.select(col("doc_id"), col(splitCol))
    lshNearDuplicates(taggedDocs, shingleSize, k, bands, threshold,
      maxBucket, textCol)
      .join(tags.select(col("doc_id").as("doc_a"), col(splitCol).as("split_a")),
        Seq("doc_a"))
      .join(tags.select(col("doc_id").as("doc_b"), col(splitCol).as("split_b")),
        Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
  }

  /** Incremental NEAR-dup: LSH candidates of each INCOMING doc against
    * the HISTORY corpus only, verified by exact token Jaccard — the
    * near-dup companion of [[incrementalDedup]] (which only catches
    * byte-identical fingerprints). No incoming×incoming or
    * history×history pair is ever generated: the band join's probe side
    * is the micro-batch, so the per-batch cost is O(batch bands ×
    * bucket), independent of history size. In a live ingest the history
    * side's banded signatures are exactly what the pipeline has already
    * computed for prior batches (persist them once, probe many times).
    * Sides must have disjoint doc_ids (a split corpus). */
  def incrementalNearDuplicates(
      incoming: DataFrame,
      history: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val stagedNew = tokenStage(incoming, textCol, None)
    val stagedOld = tokenStage(history, textCol, None)
    val prunedNew = bandedIds(stagedNew, shingleSize, k, bands, maxBucket, None)
    val prunedOld = bandedIds(stagedOld, shingleSize, k, bands, maxBucket, None)
    val pairs = prunedNew.select(col("band"), col("doc_id").as("doc_a"))
      .join(prunedOld.select(col("band"), col("doc_id").as("doc_b")), Seq("band"))
      .select("doc_a", "doc_b")
      .distinct()
    val docToks = stagedNew
      .select(col("doc_id"), array_distinct(col("__toks")).as("toks"))
      .unionByName(
        stagedOld.select(col("doc_id"), array_distinct(col("__toks")).as("toks")))
    releasing(
      jaccardOnPairs(pairs, docToks, threshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")),
      stagedNew, stagedOld, prunedNew, prunedOld)
  }

  /** Character-n-gram Jaccard near-duplicates: minhash+LSH candidate
    * generation over char n-grams of the NORMALIZED text, exact
    * distinct-hash Jaccard verify. Same scale shape as
    * lshNearDuplicates (ids-only band join, one staged text pass shared
    * by signature and verify sides); the character granularity catches
    * word-boundary edits token-set Jaccard misses.
    *
    * PERF: char n-grams are ~10× more numerous than word shingles, so
    * this pipeline runs NATIVE end-to-end: `charNgramCodes` emits
    * injective base-257 window codes in one fused byte loop (no gram
    * strings, no md5) and `minhashSketch` computes all k affine minima
    * in one pass — measured 76 s → ~4 s on the sf0.1 bench vs the
    * composable HOF form. Injective codes make the verify an EXACT
    * n-gram Jaccard; the oracle mirrors both formulas bit-for-bit. */
  def charNgramNearDuplicates(
      docs: DataFrame,
      n: Int = 4,
      k: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val staged = docs
      .select(col("doc_id"),
        charNgramCodes(normalize(col(textCol)), n).as("__gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = staged
      .filter(size(col("__gh")) >= 1)
      .withColumn("sig", minhashSketch(col("__gh"), k))
      .withColumn("band", explode(lshBands(col("sig"), bands, k / bands)))
      .select("band", "doc_id")
    val keep = banded.groupBy("band").count()
      .filter(col("count") <= maxBucket).select("band")
    val pruned = banded.join(keep, Seq("band"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = pruned.select(col("band"), col("doc_id").as("doc_a"))
      .join(pruned.select(col("band"), col("doc_id").as("doc_b")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val docGrams = staged.select(col("doc_id"), array_distinct(col("__gh")).as("toks"))
    releasing(
      jaccardOnPairs(pairs, docGrams, threshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")),
      staged, pruned)
  }

  /** Sketch-estimated near-duplicates: LSH candidates scored by the
    * MINHASH ESTIMATE (fraction of matching signature slots ≈ Jaccard)
    * BEFORE the exact verify — the production shape where the cheap
    * signature comparison prunes the candidate set and only survivors
    * pay the token-set join. Output carries both the estimate and the
    * exact Jaccard so the estimator's calibration is itself checkable.
    * The estimate filter compares the 4dp-ROUNDED value so an external
    * engine reproduces boundary decisions. */
  def minhashEstimatePairs(
      docs: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      estThreshold: Double = 0.25,
      maxBucket: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val staged = tokenStage(docs, textCol, None)
    // signatures computed ONCE, shared by band generation and the
    // estimate join (compact: id + k longs)
    val sigs = signaturesFromStage(staged, shingleSize, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs
      .withColumn("band", explode(lshBands(col("sig"), bands, k / bands)))
      .select("band", "doc_id")
    val keep = banded.groupBy("band").count()
      .filter(col("count") <= maxBucket).select("band")
    val pruned = banded.join(keep, Seq("band"))
    val pairs = pruned.select(col("band"), col("doc_id").as("doc_a"))
      .join(pruned.select(col("band"), col("doc_id").as("doc_b")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val estimated = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("est_jaccard", round(
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / k, 4))
      .filter(col("est_jaccard") >= estThreshold)
    val docToks = staged.select(col("doc_id"),
      array_distinct(col("__toks")).as("toks"))
    releasing(
      estimated
        .join(docToks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")), Seq("doc_a"))
        .join(docToks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")), Seq("doc_b"))
        .withColumn("jaccard",
          round(size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))).cast("double"), 4))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard")),
      staged, sigs)
  }

  /** Connected components over near-duplicate pairs: every document is
    * labeled with the MINIMUM doc_id reachable through the pair graph —
    * the cluster id — so "keep one doc per duplicate cluster" becomes a
    * trivial filter (doc_id == cluster).
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", 2014). Each
    * round rewires edges toward neighborhood minima — large-star hangs
    * every strictly-larger neighbor of u under m(u) = min(Γ(u) ∪ u),
    * small-star re-hangs each node's smaller neighbors under the
    * neighborhood minimum — and the edge set converges to per-component
    * stars centered at the component minimum in O(log n) rounds EVEN ON
    * CHAIN GRAPHS (star-hanging doubles the reach per round), where
    * plain min-label propagation needs O(diameter) rounds — the
    * difference between ~10 and ~1000 rounds on a 1000-link chain of
    * boilerplate near-dups. Each round is two (groupBy-min + join)
    * passes over compact (u, v) edges, checkpointed so lineage doesn't
    * grow with iterations. */
  def nearDupClusters(pairs: DataFrame): DataFrame =
    nearDupClustersWithRounds(pairs)._1

  /** [[nearDupClusters]] plus the number of star rounds executed —
    * exposed so the convergence-bound spec can pin the O(log n)
    * behavior.
    *
    * TWO-TIER execution, gated on the EDGE count (not the corpus):
    *  - at or below `driverEdgeThreshold`, union-find on the driver —
    *    the LSH pair graph is orders of magnitude smaller than the
    *    corpus (near-dups are rare by construction), so the common case
    *    is a metadata-sized collect (2M edges ≈ 32 MB) solved in
    *    milliseconds instead of paying multi-round shuffle latency;
    *  - above it, distributed alternating large-star/small-star rounds:
    *    O(log n) rounds on any graph shape, edges-only shuffles. This
    *    is the 100 TB path (billions of pair edges never fit a driver).
    * The threshold is a parameter so tests (and extreme deployments)
    * can force either tier. */
  private[graft] def nearDupClustersWithRounds(
      pairs: DataFrame,
      driverEdgeThreshold: Long = 2000000L): (DataFrame, Int) = {
    // the (possibly expensive) candidate-pair pipeline is read 4 times
    // below (edges union + node-id union) — cache it, materialize both
    // compact derived sets eagerly, release before the rounds start
    val p = pairs.select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // canonical orientation u < v, deduped — star rounds preserve it
    var edges = p
      .filter(col("doc_a") =!= col("doc_b"))
      .select(
        least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val nodes = p.select(col("doc_a").as("doc_id"))
      .union(p.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint(true)
    p.unpersist(false)
    var prevCount = edges.count()
    if (prevCount <= driverEdgeThreshold) {
      // tier 1: union-find with union-by-minimum (the smaller root
      // becomes parent), so each root IS the component-minimum doc_id —
      // the same label the star rounds converge to
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
      val assigned = es.iterator.flatMap { case (u, v) => Iterator(u, v) }
        .toArray.distinct.map(x => (x, find(x))).toSeq
        .toDF("doc_id", "cluster")
      val labels = assigned.union(
        nodes.join(assigned.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("cluster")))
      edges.unpersist(false)
      return (labels, 0)
    }
    var rounds = 0
    var converged = prevCount == 0L
    while (!converged) {
      rounds += 1
      require(rounds <= 64,
        "nearDupClusters: star rounds exceeded 64 — not converging")
      // LARGE-STAR: over symmetric neighborhoods, attach every neighbor
      // v > u to m(u) = min(Γ(u) ∪ {u}); m(u) <= u < v keeps the
      // canonical orientation and can't create self-loops
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("m"))
      // cached: consumed by BOTH the small-star re-hang and its
      // neighborhood-minimum agg — uncached, the join+distinct DAG
      // would execute twice inside one round
      val large = sym.filter(col("v") > col("u"))
        .join(m, Seq("u"))
        .select(col("m").as("u"), col("v"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // SMALL-STAR: per node v, re-hang its smaller neighbors (all its
      // u partners under the canonical orientation) and v itself under
      // the neighborhood minimum
      val mm = large.groupBy("v").agg(min("u").as("m"))
      val small = large.join(mm, Seq("v"))
        .select(col("m").as("u"), col("u").as("v"))
        .union(mm.select(col("m").as("u"), col("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      large.unpersist(false)
      // fixed point: the round rewired nothing. Both sides are DISTINCT
      // canonically-oriented sets, so equality is |A| = |B| plus ONE
      // empty one-sided difference — and the count is a cheap action on
      // the just-checkpointed result, so most rounds (counts moving)
      // skip the exceptAll shuffle entirely
      val cnt = small.count()
      converged = cnt == prevCount && small.exceptAll(edges).isEmpty
      val prev = edges
      edges = small
      prevCount = cnt
      prev.unpersist(false) // release the superseded round's blocks
    }
    // at the fixed point the edges ARE per-component stars (u = the
    // component minimum); centers and isolated nodes label themselves
    val assigned = edges.groupBy("v").agg(min("u").as("cluster"))
      .select(col("v").as("doc_id"), col("cluster"))
    val labels = assigned.union(
      nodes.join(assigned.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster")))
    (labels, rounds)
  }

  /** 16-bit simhash per document, hash array staged as a column. */
  def simhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__th", tokenHashes16(col("__toks")))
      .withColumn("simhash", simhash16FromHashes(col("__th")))
      .drop("__toks", "__th")

  /** SimHash near-duplicates: hamming distance ≤ 1 over the 16-bit
    * signatures.
    *
    * The search runs on DISTINCT signatures, not documents: a 16-bit
    * space has ≤ 65,536 values, and a pair within distance 1 is equal or
    * differs in exactly one of 16 bits, so each distinct signature emits
    * itself plus its 16 single-bit flips and the realized signature
    * pairs come from one equi-join of that variant set against the
    * distinct signatures (≤ 17 × 65k rows — broadcastable at ANY corpus
    * size). Documents then join back BY SIGNATURE to expand the matched
    * pairs, so total cost is linear in corpus + output. The previous
    * 8-bit-half pigeonhole bucketing self-joined documents into
    * O(n²/256) candidate rows — quadratic at scale; this plan never
    * self-joins the corpus at all. */
  def simhashNearDuplicates(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sigs = simhashSignatures(docs, textCol).select("doc_id", "simhash")
      // compact (id, sig) rows, read by the distinct pass and both
      // expansion sides — cached so the text is tokenized exactly once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val distinctSigs = sigs.select("simhash").distinct()
    // (sh_a ≤ sh_b) signature pairs at hamming distance ≤ 1: identity
    // variant covers distance 0, each single-bit flip distance 1; the
    // ≤ filter keeps exactly one orientation of every unordered pair
    val variants = distinctSigs.select(
      col("simhash").as("sh_a"),
      explode(array(col("simhash") +: (0 until 16).map(b =>
        col("simhash").bitwiseXOR(lit(1 << b))): _*)).as("sh_b"))
      .filter(col("sh_a") <= col("sh_b"))
    val sigPairs = variants.join(distinctSigs.select(col("simhash").as("sh_b")), Seq("sh_b"))
    val a = sigs.select(col("simhash").as("sh_a"), col("doc_id").as("da"))
    val b = sigs.select(col("simhash").as("sh_b"), col("doc_id").as("db"))
    // a doc pair maps to exactly one signature pair, so no dedup pass is
    // needed; least/greatest restores id order for cross-group pairs
    releasing(
      a.join(broadcast(sigPairs), Seq("sh_a")).join(b, Seq("sh_b"))
        .filter(col("sh_a") =!= col("sh_b") || col("da") < col("db"))
        .filter(col("da") =!= col("db"))
        .select(
          least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          hamming16(col("sh_a"), col("sh_b")).cast("long").as("dist")),
      sigs)
  }

  /** Cross-split contamination: for every eval-split document, the
    * training documents that contain a large fraction of its word
    * shingles — the "is the benchmark in the training set?" check every
    * training-data pipeline runs before a model ships. The score is
    * shingle CONTAINMENT (shared distinct shingles / eval's distinct
    * shingles), not Jaccard: a short eval prompt fully embedded in a long
    * training doc should score 1.0, which symmetric Jaccard would dilute.
    *
    * Scale shape: both sides reduce to exploded (hash, id) rows — the
    * join carries 8-byte keys and ids only, never text. The train-side
    * document-frequency cap drops boilerplate shingles (shared by
    * thousands of training docs): they carry no contamination signal but
    * would dominate the join fanout, exactly like the LSH `maxBucket`
    * guard. Candidate scoring is one count-agg per (eval, train) pair. */
  def crossSplitContamination(
      evalDocs: DataFrame,
      trainDocs: DataFrame,
      shingleSize: Int = 3,
      maxDf: Int = 1000,
      threshold: Double = 0.5,
      textCol: String = "text"): DataFrame = {
    def hashed(df: DataFrame, idAs: String): DataFrame = df
      .withColumn("__toks", tokens(col(textCol)))
      .filter(size(col("__toks")) >= shingleSize)
      .select(col("doc_id").as(idAs),
        array_distinct(shingleMd5Longs(col("__toks"), shingleSize, 15)).as("__hs"))
    // eval side is read twice (sizes + exploded hashes): stage it once
    val ev = hashed(evalDocs, "eval_doc")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalSizes = ev.select(col("eval_doc"), size(col("__hs")).as("__n_eval"))
    val evalH = ev.select(col("eval_doc"), explode(col("__hs")).as("h"))
    // train side is read twice too (df-cap + join)
    val trainH = hashed(trainDocs, "train_doc")
      .select(col("train_doc"), explode(col("__hs")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = trainH.groupBy("h").count()
      .filter(col("count") <= maxDf).select("h")
    val shared = evalH
      .join(trainH.join(keep, Seq("h")), Seq("h"))
      .groupBy("eval_doc", "train_doc")
      .agg(count(lit(1)).as("n_shared"))
    releasing(
      shared
        .join(evalSizes, Seq("eval_doc"))
        .withColumn("overlap",
          round(col("n_shared").cast("double") / col("__n_eval").cast("double"), 4))
        .filter(col("overlap") >= threshold)
        .select(col("eval_doc"), col("train_doc"), col("overlap")),
      ev, trainH)
  }

  /** Duplicated n-gram span coverage: the fraction of each document's
    * DISTINCT word n-grams occurring in at least `minDocs` documents —
    * the repeated-span signal behind exact-substring dedup (the
    * "dedup training data" measure at n-gram granularity). A
    * high-coverage doc is assembled from corpus-repeated content even
    * when no single document matches it end-to-end (template families,
    * boilerplate mosaics); d32's single-word df ratio cannot see spans.
    *
    * Scale shape: grams live as 60-bit md5 longs from the first
    * projection on (strings never shuffle); one distinct over (doc,
    * gram), one df agg on the gram key, one join back. All three hash
    * exchanges carry (long, long) pairs — at 100 TB the widest state is
    * the distinct, which is the signal's irreducible cost. */
  def dupNgramCoverage(
      docs: DataFrame,
      shingleSize: Int = 5,
      minDocs: Int = 2,
      textCol: String = "text"): DataFrame = {
    val grams = docs
      .withColumn("__toks", tokens(col(textCol)))
      .filter(size(col("__toks")) >= shingleSize)
      .select(col("doc_id"),
        explode(array_distinct(shingleMd5Longs(col("__toks"), shingleSize, 15)))
          .as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = grams.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs).select("h")
    val perDoc = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = grams.join(dup, Seq("h"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    releasing(
      perDoc.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          round(coalesce(col("n_dup"), lit(0L)).cast("double")
            / col("n_grams").cast("double"), 4).as("dup_frac")),
      grams)
  }

  /** The decontaminated training split: training documents minus every
    * doc flagged by crossSplitContamination — the filter actually
    * applied before training once the contamination report is reviewed.
    * One left-anti join on ids against the (small) flagged set. */
  def decontaminate(
      trainDocs: DataFrame,
      contamination: DataFrame): DataFrame =
    trainDocs.join(
      contamination.select(col("train_doc").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** EXACT-SUBSTRING dedup at duplicated-span granularity — the
    * ACTIONABLE counterpart of [[dupNgramCoverage]] (which only
    * scores): every occurrence of a corpus-duplicated n-token span is
    * REMOVED except one canonical owner occurrence (the
    * lexicographically first (doc_id, pos) in the corpus), and each
    * document's text is rebuilt from its surviving tokens. This is the
    * "train on each repeated span once" policy of suffix-array
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"), realized at n-gram
    * resolution: a maximal repeated substring of length L ≥ n is
    * covered by its L−n+1 duplicated n-grams, so the entire span
    * disappears from every non-owner occurrence while unique text is
    * untouched. (A distributed suffix ARRAY buys the same detection
    * for unbounded span lengths; at fixed n the duplicated-gram cover
    * is equivalent and needs only hash aggregation.)
    *
    * Scale shape: duplication and ownership are decided on 60-bit gram
    * hashes — the df/owner aggregation and the occurrence join shuffle
    * (long, long, int) triples, never text. The removal mask comes
    * back to the doc row as ONE sorted int array per document (an
    * affected-docs-sized frame: broadcast when small, otherwise the
    * token arrays pay a single doc_id shuffle for the mask join — the
    * one corpus-sized move, irreducible for any text-REWRITING
    * operator), and the rebuild (`array_except` over positions +
    * per-element `element_at`) is a row-local projection.
    * `minCount` counts OCCURRENCES (a span repeated twice inside one
    * document is deduplicated too, like the suffix-array original). */
  def exactSubstringDedup(
      docs: DataFrame,
      shingleSize: Int = 5,
      minCount: Int = 2,
      textCol: String = "text"): DataFrame = {
    val staged = tokenStage(docs, textCol, None)
    val occ = staged
      .filter(size(col("__toks")) >= shingleSize)
      .select(col("doc_id"),
        posexplode(shingleMd5Longs(col("__toks"), shingleSize, 15))
          .as(Seq("pos", "h")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // min over the (doc_id, pos) struct = lexicographic owner
    val dup = occ.groupBy("h")
      .agg(count(lit(1)).as("__c"),
        min(struct(col("doc_id"), col("pos"))).as("__own"))
      .filter(col("__c") >= minCount)
      .select(col("h"), col("__own.doc_id").as("__od"),
        col("__own.pos").as("__op"))
    val removed = occ.join(dup, Seq("h"))
      .filter(!(col("doc_id") === col("__od") && col("pos") === col("__op")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(shingleSize - 1))).as("p"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("p"))).as("__rem"))
    val keptPos = array_except(
      sequence(lit(0), size(col("__toks")) - 1),
      coalesce(col("__rem"), array().cast("array<int>")))
    releasing(
      staged.join(removed, Seq("doc_id"), "left")
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          coalesce(size(col("__rem")), lit(0)).cast("long").as("n_removed"),
          concat_ws(" ",
            transform(keptPos, p => element_at(col("__toks"), p + 1)))
            .as("text_deduped")),
      staged, occ)
  }

  /** Near-duplicates within a blocking key (e.g. source): LSH band
    * candidates CONFINED to the block, then exact Jaccard verify — the
    * scale-safe form of blocked dedup (candidates must share block AND
    * band, so a skewed block costs bucketed-LSH work, not O(n²)). */
  def blockedJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      maxBucket: Int = 10000,
      textCol: String = "text"): DataFrame = {
    val staged = tokenStage(docs, textCol, Some(blockCol))
    // bandedRaw is the frame that holds the cache; the renamed projection
    // over it would not match the cached plan in unpersist
    val bandedRaw = bandedIds(staged, shingleSize, k, bands, maxBucket, Some(blockCol))
    val banded = bandedRaw.withColumnRenamed(blockCol, "blk")
    val pairs = banded.select(col("band"), col("blk"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("blk"), col("doc_id").as("doc_b")),
        Seq("band", "blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("blk", "doc_a", "doc_b")
      .distinct()
    val docToks = staged.select(col("doc_id"),
      array_distinct(col("__toks")).as("toks"))
    releasing(
      jaccardOnPairs(pairs, docToks, threshold)
        .select(col("blk"), col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")),
      staged, bandedRaw)
  }
}
