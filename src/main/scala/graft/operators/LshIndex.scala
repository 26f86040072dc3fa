package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.LakeCatalog

/** Persistent MinHash-LSH near-duplicate index over the LakeTable store
  * — build once, probe every micro-batch, append the batch after it
  * clears. The text analog of [[IvfIndex]], and the production shape of
  * corpus-scale near-dup screening: `incrementalNearDuplicates` (d47)
  * re-tokenizes and re-sketches the ENTIRE history on every batch,
  * which at 100 TB means a full-corpus pass per micro-batch; with the
  * index, history-side signatures are computed exactly once at ingest
  * and each batch's cost is O(batch + candidate pairs).
  *
  * Tables (per index `name`):
  *  - `<name>_bands`: (band, doc_id) — the inverted index; a probe is a
  *    band-equality join, bucket-capped on both sides;
  *  - `<name>_toks`: (doc_id, toks) — distinct token sets for the exact
  *    Jaccard verify of candidate pairs (only candidates are joined
  *    back, never the corpus).
  *
  * LSH parameters are pinned as table properties at build time and
  * reused by probe/append — mixing signatures from different parameter
  * sets would silently miss pairs, so the index refuses to drift.
  *
  * `maxBucket` capping: the INDEX side applies the cap per ingest batch
  * (build or append) — a bucket oversized within any single generation
  * is boilerplate and its rows are dropped at write time, matching the
  * per-side capping the one-shot operators use. The probe side caps the
  * incoming batch's own buckets the same way.
  */
object LshIndex {

  private val ParamKeys =
    Seq("lsh.shingle", "lsh.k", "lsh.bands", "lsh.max-bucket")

  /** (staged tokens, banded ids, distinct token sets) for one batch —
    * staged and banded are PERSISTED by the helpers; callers release
    * both once their writes/joins have consumed them. */
  private def bandsFor(
      docs: DataFrame,
      shingleSize: Int, k: Int, bands: Int, maxBucket: Int,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val staged = Dedup.tokenStage(docs, textCol, None)
    val banded = Dedup.bandedIds(staged, shingleSize, k, bands, maxBucket, None)
      .select("band", "doc_id")
    val toks = staged
      .select(col("doc_id"), array_distinct(col("__toks")).as("toks"))
    (staged, banded, toks)
  }

  /** Tokenize + sketch the corpus ONCE and persist the inverted index.
    * Idempotent (createOrReplace). */
  def build(
      cat: LakeCatalog,
      db: String,
      name: String,
      corpus: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      maxBucket: Int = 1000,
      textCol: String = "text"): Unit = {
    val (staged, banded, toks) = bandsFor(corpus, shingleSize, k, bands, maxBucket, textCol)
    val props = Map(
      "lsh.shingle" -> shingleSize.toString,
      "lsh.k" -> k.toString,
      "lsh.bands" -> bands.toString,
      "lsh.max-bucket" -> maxBucket.toString)
    // _toks commits FIRST: the two tables are separate commits, and a
    // crash between them must leave "token sets without bands" (docs
    // merely not yet indexed) — never band rows whose documents have no
    // token sets, which query's inner join would silently drop as
    // candidate pairs (missed near-duplicates). That order only covers
    // fresh builds and appends; a crashed REBUILD over an existing
    // index instead leaves NEW toks with OLD bands — so both commits
    // carry a shared build-generation id and params() refuses to serve
    // a skewed index (the recovery is re-running build).
    val gen = java.util.UUID.randomUUID().toString
    cat.table(s"$db.${name}_toks").createOrReplace(toks,
      tableProperties = Map(GenProp -> gen))
    cat.table(s"$db.${name}_bands").createOrReplace(banded,
      tableProperties = props + (GenProp -> gen))
    banded.unpersist(false); staged.unpersist(false)
    ()
  }

  /** Shared build-generation id stamped on BOTH tables' build commits
    * (rebuild-crash skew detection — see [[build]]). */
  private[graft] val GenProp = "lsh.build-gen"

  /** Sketch one batch under the index's PINNED parameters — the shared
    * front half of [[query]] and [[appendBatch]], exposed so a caller
    * doing probe-then-append on the SAME batch (the streaming screen,
    * [[graft.streaming.IndexedDocStreams.screenBatch]]) tokenizes and
    * minhashes it ONCE instead of once per half. Returns (staged,
    * banded, toks); staged and banded are persisted — the caller MUST
    * unpersist both after its writes/joins have consumed them. */
  private[graft] def sketchFor(
      cat: LakeCatalog,
      db: String,
      name: String,
      docs: DataFrame,
      textCol: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    val (sh, k, b, mb) = params(cat, db, name)
    bandsFor(docs, sh, k, b, mb, textCol)
  }

  private def params(cat: LakeCatalog, db: String, name: String): (Int, Int, Int, Int) = {
    val props = cat.table(s"$db.${name}_bands").properties
    ParamKeys.find(!props.contains(_)).foreach(k =>
      throw new IllegalStateException(s"index $name missing property $k — rebuild"))
    val toksGen = cat.table(s"$db.${name}_toks").properties.get(GenProp)
    val bandsGen = props.get(GenProp)
    if (toksGen != bandsGen)
      throw new IllegalStateException(
        s"index $name generation skew (toks=$toksGen, bands=$bandsGen): an " +
          "interrupted rebuild left band rows referencing replaced token " +
          "sets — re-run build before serving probes or appends")
    (props("lsh.shingle").toInt, props("lsh.k").toInt,
      props("lsh.bands").toInt, props("lsh.max-bucket").toInt)
  }

  /** Incremental ADD under the index's frozen parameters: sketch ONLY
    * the new docs and append — O(batch), no history re-read. */
  def append(
      cat: LakeCatalog,
      db: String,
      name: String,
      newDocs: DataFrame,
      textCol: String = "text"): Unit = {
    val (sh, k, b, mb) = params(cat, db, name)
    val (staged, banded, toks) = bandsFor(newDocs, sh, k, b, mb, textCol)
    // same commit order as build: toks first (see build)
    cat.table(s"$db.${name}_toks").append(toks)
    cat.table(s"$db.${name}_bands").append(banded)
    banded.unpersist(false); staged.unpersist(false)
    ()
  }

  /** Last-applied micro-batch id, recorded PER TABLE on its own append
    * commit (streaming-sink replay guard — see [[appendBatch]]). */
  private[graft] val BatchProp = "lsh.last-batch"

  /** Idempotent per-micro-batch ADD — the streaming-ingest shape
    * ([[graft.streaming.IndexedDocStreams]]): each index table records
    * the last applied batch id in its own commit properties, and a
    * replayed batch skips per table. The two commits keep build/append's
    * toks-first order, so a crash between them leaves only "token sets
    * without bands" (docs not yet indexed, repaired by the replay) —
    * and the replay appends ONLY the missing bands, never duplicate
    * token sets. Returns false when the batch had fully applied.
    * Single sequential writer assumed (a streaming query's foreachBatch
    * contract): batch ids must arrive monotonically — the guard is a
    * high-water mark, not a set. */
  def appendBatch(
      cat: LakeCatalog,
      db: String,
      name: String,
      newDocs: DataFrame,
      batchId: Long,
      textCol: String = "text"): Boolean = {
    val toksT = cat.table(s"$db.${name}_toks")
    val bandsT = cat.table(s"$db.${name}_bands")
    def applied(t: graft.store.LakeTable): Boolean =
      t.properties.get(BatchProp).exists(_.toLong >= batchId)
    if (applied(bandsT)) return false
    val (staged, banded, toks) = sketchFor(cat, db, name, newDocs, textCol)
    try appendSketched(cat, db, name, banded, toks, batchId)
    finally { banded.unpersist(false); staged.unpersist(false); () }
  }

  /** [[appendBatch]] over an ALREADY-SKETCHED batch (from [[sketchFor]]
    * — same index, same parameters; the probe-then-append callers).
    * Caller keeps ownership of the sketch caches. */
  private[graft] def appendSketched(
      cat: LakeCatalog,
      db: String,
      name: String,
      banded: DataFrame,
      toks: DataFrame,
      batchId: Long): Boolean = {
    val toksT = cat.table(s"$db.${name}_toks")
    val bandsT = cat.table(s"$db.${name}_bands")
    def applied(t: graft.store.LakeTable): Boolean =
      t.properties.get(BatchProp).exists(_.toLong >= batchId)
    if (applied(bandsT)) return false
    val prop = Map(BatchProp -> batchId.toString)
    if (!applied(toksT)) toksT.append(toks, prop)
    bandsT.append(banded, prop)
    true
  }

  /** Probe: near-dup pairs (incoming doc_a × indexed doc_b) with exact
    * Jaccard ≥ threshold. One band-equality join generates candidates
    * (ids only), then ONLY candidates join their token sets back. */
  def query(
      cat: LakeCatalog,
      db: String,
      name: String,
      incoming: DataFrame,
      threshold: Double = 0.5,
      textCol: String = "text"): DataFrame = {
    val (inStaged, inBands, inToks) = sketchFor(cat, db, name, incoming, textCol)
    Dedup.releasing(
      querySketched(cat, db, name, inBands, inToks, threshold),
      inStaged, inBands)
  }

  /** [[query]] over an ALREADY-SKETCHED batch (from [[sketchFor]]).
    * Lazy — the caller materializes (write/collect) while it still
    * owns the sketch caches, then unpersists them. */
  private[graft] def querySketched(
      cat: LakeCatalog,
      db: String,
      name: String,
      inBands: DataFrame,
      inToks: DataFrame,
      threshold: Double): DataFrame = {
    val idxBands = cat.table(s"$db.${name}_bands").read
    val idxToks = cat.table(s"$db.${name}_toks").read
    val pairs = inBands.select(col("band"), col("doc_id").as("doc_a"))
      .join(idxBands.select(col("band"), col("doc_id").as("doc_b")), Seq("band"))
      .select("doc_a", "doc_b")
      .distinct()
    val docToks = inToks.unionByName(idxToks)
    Dedup.jaccardOnPairs(pairs, docToks, threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
