package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfIndex
import graft.store.LakeCatalog

/** Streaming VECTOR ingest against the persistent IVF index — the ANN
  * counterpart of [[IndexedDocStreams]]: each micro-batch of embeddings
  * first runs a kNN PROBE against everything indexed so far (the
  * semantic near-dup / retrieval screen on the ingest path), then
  * appends itself under the index's frozen coarse quantizer. Batch
  * consumers and the stream share ONE index; a periodic
  * `IvfIndex.rebalance`/`build` retrains off the ingest path, exactly
  * like compaction.
  *
  * Exactly-once by the same order + idempotence contract as the doc
  * screen: neighbors are computed against the pre-append snapshot (a
  * batch never matches itself), land as a dynamic overwrite of only
  * their `batch_id=` partition, and the index append commits last with
  * the batch id riding the same cells-table commit
  * ([[IvfIndex.appendBatch]]) — simpler here, because the add touches
  * exactly one table.
  *
  * Scale shape per batch: one broadcast-centroid assignment of the
  * batch, a probe confined to `nprobe` cells (partition-pruned scan),
  * and an O(batch) append — nothing grows with the index except the
  * pruned cell read.
  */
object IndexedVecStreams {

  /** Process ONE micro-batch (vec_id, embedding): probe → write
    * neighbors partition → append. No-op when `batchId` already
    * applied. */
  def screenBatch(
      cat: LakeCatalog,
      db: String,
      name: String,
      batch: DataFrame,
      batchId: Long,
      outDir: String,
      k: Int = 5,
      nprobe: Int = 3): Unit = {
    val cells = cat.table(s"$db.${name}_cells")
    if (cells.properties.get(IvfIndex.BatchProp).exists(_.toLong >= batchId))
      return // fully applied: the output partition predates the append
    IvfIndex.query(cat, db, name, batch, k, nprobe)
      .withColumn("batch_id", lit(batchId))
      // rebalance into the batch_id leaf: the probe result arrives from
      // shuffle.partitions reducers and would land that many tiny files
      // per batch; AQE sizes the leaf's files by the advisory target
      .hint("rebalance", col("batch_id"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
    IvfIndex.appendBatch(cat, db, name, batch, batchId)
    ()
  }

  /** Attach the screen to a streaming embedding frame. The index must
    * exist ([[IvfIndex.build]] the bootstrap corpus first).
    *
    * `compactEveryBatches` > 0 folds the cells table every N batches
    * after the batch's own screen+append ([[IvfIndex.compact]] — each
    * append commits one manifest entry per touched cell leaf, so an
    * unfolded streamed index pays ever-growing probe planning);
    * content-preserving and idempotent, same contract as the doc
    * screen's interval compaction. */
  def run(
      stream: DataFrame,
      cat: LakeCatalog,
      db: String,
      name: String,
      outDir: String,
      checkpoint: String,
      k: Int = 5,
      nprobe: Int = 3,
      compactEveryBatches: Int = 0,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        screenBatch(cat, db, name, batch, id, outDir, k, nprobe)
        if (compactEveryBatches > 0 && id > 0 && id % compactEveryBatches == 0) {
          IvfIndex.compact(cat, db, name)
          ()
        }
      }
      .start()
}
