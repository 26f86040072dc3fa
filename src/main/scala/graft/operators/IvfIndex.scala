package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.store.LakeCatalog

/** Persistent IVF index over the LakeTable store: build once, query many.
  *
  * `build` trains the coarse quantizer (per-label centroids — at scale a
  * k-means loop over the same aggregation), assigns every corpus vector
  * to its nearest cell map-side, and persists BOTH as tables:
  *
  *  - `<name>_centroids`: nlist rows — tiny, broadcast at query time;
  *  - `<name>_cells`: the corpus PARTITIONED BY cell, so probing is a
  *    partition-pruned scan — a query touches nprobe cells' files and
  *    never the other (nlist − nprobe)/nlist of the corpus. This is the
  *    on-disk analog of an IVF inverted list, and the file-skipping is
  *    what makes repeated querying cheap at 100 TB (e04 re-derives the
  *    whole index per query instead).
  *
  * Query planning collects the probed cell ids to the driver (bounded by
  * min(queries×nprobe, nlist) — index metadata, like Iceberg manifest
  * planning) so the cells scan carries a LITERAL partition filter that
  * prunes at file-listing time.
  */
object IvfIndex {

  private def nearestCells(vectors: DataFrame, cents: DataFrame, n: Int,
      idAs: String, vecAs: String): DataFrame = {
    val byCos = Window.partitionBy(idAs).orderBy(desc("cos_c"), col("label"))
    vectors
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col(vecAs), col("centroid")))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= n)
      .select(col("label").as("cell"), col(idAs), col(vecAs))
  }

  /** Train + assign + persist. Idempotent (createOrReplace). */
  def build(cat: LakeCatalog, db: String, name: String, corpus: DataFrame): Unit = {
    val cents = Similarity.labelCentroidVectors(corpus)
    cat.table(s"$db.${name}_centroids").createOrReplace(cents)
    val assigned = nearestCells(
      corpus.select(col("vec_id"), col("embedding")), cents, n = 1,
      idAs = "vec_id", vecAs = "embedding")
    cat.table(s"$db.${name}_cells")
      .createOrReplace(assigned, partitionBy = Seq("cell"))
  }

  /** Incremental ADD: assign new vectors to the EXISTING (frozen) coarse
    * quantizer and APPEND them to the partitioned cells table — the
    * standard IVF maintenance path: no retrain, no rebuild, and the
    * store-level append never rewrites untouched cells' files. Recall
    * drifts only as the data distribution drifts, which is when a
    * periodic `build` re-trains (the compaction analog). */
  def append(cat: LakeCatalog, db: String, name: String, newVectors: DataFrame): Unit = {
    val cents = cat.table(s"$db.${name}_centroids").read
    val assigned = nearestCells(
      newVectors.select(col("vec_id"), col("embedding")), cents, n = 1,
      idAs = "vec_id", vecAs = "embedding")
    cat.table(s"$db.${name}_cells").append(assigned)
    ()
  }

  /** Last-applied micro-batch id, recorded on the cells table's own
    * append commit (streaming-sink replay guard — [[appendBatch]]). */
  private[graft] val BatchProp = "ivf.last-batch"

  /** Idempotent per-micro-batch ADD — the streaming-ingest shape
    * ([[graft.streaming.IndexedVecStreams]]): [[append]] under the
    * frozen quantizer, with the last applied batch id riding the SAME
    * cells-table commit, so a replayed foreachBatch is a no-op. The
    * index is one table (centroids are never touched by an add), so
    * the guard IS the transaction. Returns false on a replay.
    * Single sequential writer assumed (a streaming query's foreachBatch
    * contract): batch ids must arrive monotonically — the guard is a
    * high-water mark, not a set. */
  def appendBatch(
      cat: LakeCatalog,
      db: String,
      name: String,
      newVectors: DataFrame,
      batchId: Long): Boolean = {
    val cells = cat.table(s"$db.${name}_cells")
    if (cells.properties.get(BatchProp).exists(_.toLong >= batchId)) return false
    val cents = cat.table(s"$db.${name}_centroids").read
    val assigned = nearestCells(
      newVectors.select(col("vec_id"), col("embedding")), cents, n = 1,
      idAs = "vec_id", vecAs = "embedding")
    cells.append(assigned, Map(BatchProp -> batchId.toString))
    true
  }

  /** Remove vectors from the index — the retraction path: one
    * key-pruned delete on the cells table (`deleteMatching` dispatches
    * COW or merge-on-read per `write.delete.mode`). The centroids
    * table is untouched (the frozen quantizer is statistics, not
    * content — the next `rebalance`/`build` re-trains without the
    * removed vectors). Exact: a removed vector can never surface as a
    * neighbor, and cell partition pruning confines the rewrite to the
    * cells that actually held it. */
  def remove(
      cat: LakeCatalog,
      db: String,
      name: String,
      vecIds: DataFrame): Unit = {
    cat.table(s"$db.${name}_cells")
      .deleteMatching(vecIds.select("vec_id"), Seq("vec_id"))
    ()
  }

  /** Fold the cells table's accumulated append generations: one plain
    * compaction (the store's `rewriteDataFiles`, layout-preserving —
    * the table stays cell-partitioned). Every streamed append commits
    * one manifest entry PER TOUCHED CELL LEAF (up to batch-size
    * entries per micro-batch — the ScaleProbe ivf ladder measures
    * this), and probes walk entries driver-side, so an unfolded index
    * eventually pays O(appends × touched-leaves) planning per query.
    * Contents are moved, never changed: probe results, the replay
    * high-water mark, and the centroids table (untouched) all
    * survive. Run off the ingest path on a maintenance cadence —
    * `rebalance`'s cheaper sibling for when the quantizer has NOT
    * drifted. Returns (filesBefore, filesAfter). */
  def compact(
      cat: LakeCatalog,
      db: String,
      name: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    cat.table(s"$db.${name}_cells").rewriteDataFiles(targetFileBytes)

  /** Centroid re-balance after appends — the periodic maintenance step
    * production IVF engines run when the data distribution has drifted
    * from the quantizer (appends keep their frozen-centroid cell
    * assignments forever; recall decays as the corpus moves).
    *
    *  1. re-train: each cell's centroid becomes the mean of the vectors
    *     CURRENTLY assigned to it (one k-means step over the full cells
    *     table — a scan + fixed-size agg, the cheapest sound re-train);
    *  2. re-assign: every vector's nearest cell under the NEW centroids
    *     is computed map-side (broadcast nlist×dim table, like build);
    *  3. move ONLY the vectors whose cell changed: a key-pruned
    *     copy-on-write delete out of their old cell partitions plus an
    *     append into the new ones. Unmoved vectors' files are never
    *     rewritten, so the commit cost tracks the number of MOVED
    *     vectors (ScaleProbe pins this), not the index size.
    *
    * Returns the number of vectors moved. The moved set is persisted
    * across its two consumers (the delete's key join and the append)
    * so the reassignment argmax runs once.
    */
  def rebalance(cat: LakeCatalog, db: String, name: String): Long = {
    val cells = cat.table(s"$db.${name}_cells")
    val current = cells.read.select("cell", "vec_id", "embedding")
    val newCents = current
      .select(col("cell").as("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("c")))),
        s => round(s("c"), 6)).as("centroid"))
    cat.table(s"$db.${name}_centroids").createOrReplace(newCents)
    val reassigned = nearestCells(
      current.select(col("vec_id"), col("embedding")),
      cat.table(s"$db.${name}_centroids").read, n = 1,
      idAs = "vec_id", vecAs = "embedding")
    val moved = reassigned
      .join(current.select(col("vec_id"), col("cell").as("old_cell")), Seq("vec_id"))
      .filter(col("cell") =!= col("old_cell"))
      .select("cell", "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = moved.count() // materialize before mutating the table
      // ONE atomic commit: a partition-moving MERGE deletes each moved
      // vector from its old cell and lands it in the new one together —
      // a delete+append pair would leave the index missing every moved
      // vector if the writer died between the two commits
      if (n > 0) cells.mergeInto(moved, Seq("vec_id"))
      n
    } finally { moved.unpersist(); () }
  }

  /** ANN top-k against the persisted index. */
  def query(
      cat: LakeCatalog,
      db: String,
      name: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int): DataFrame = {
    val cents = cat.table(s"$db.${name}_centroids").read
    // eager local checkpoint: the assignment feeds BOTH the probed-cell
    // collect and the broadcast join — without it the batch×nlist
    // distance pass runs twice; the checkpointed payload is only
    // (cell, query_id, qv) × nprobe, bounded by the query batch
    val probes = nearestCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      cents, n = nprobe, idAs = "query_id", vecAs = "qv")
      .localCheckpoint(true)
    // literal IN over the partition column, through readWhere: the
    // manifest's degenerate [v,v] partition ranges drop non-probed
    // cells' entries at PLANNING time (plan size tracks nprobe, not the
    // index's cell count), and the scan's directory pruning then skips
    // their files — versus read+filter, which planned every entry and
    // relied on the file source alone
    val probedCells = probes.select("cell").distinct().collect().map(_.get(0))
    val cellRows = cat.table(s"$db.${name}_cells")
      .readWhere(col("cell").isin(probedCells.toIndexedSeq: _*))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))
    cellRows
      .join(broadcast(probes), Seq("cell"))
      .withColumn("cos", cosine(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }
}
