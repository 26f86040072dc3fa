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

  /** ANN top-k against the persisted index. */
  def query(
      cat: LakeCatalog,
      db: String,
      name: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int): DataFrame = {
    val cents = cat.table(s"$db.${name}_centroids").read
    val probes = nearestCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      cents, n = nprobe, idAs = "query_id", vecAs = "qv")
    // literal IN over the partition column → file-pruned cells scan
    val probedCells = probes.select("cell").distinct().collect().map(_.get(0))
    val cellRows = cat.table(s"$db.${name}_cells").read
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
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
