package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.Dedup
import graft.store.LakeTable

/** Streaming training-corpus ingest: the production composition of the
  * dedup operators with the versioned table store. Each micro-batch
  * exact-dedups against the PERSISTENT fingerprint store (and within
  * itself) before appending, so the corpus never stores two documents
  * with the same content fingerprint.
  *
  * Exactly-once shape: the CDC pipeline gets replay idempotence from
  * MERGE-by-key; here it falls out of the dedup semantics — a replayed
  * batch finds its own fingerprints already in the store and reduces to
  * a no-op — while the hot path stays an APPEND (no copy-on-write
  * rewrite; O(batch) work and one key anti-join against the store per
  * commit, history text never read).
  */
object DocIngest {

  private val FpSchema = StructType(Seq(StructField("fp", StringType)))

  /** Apply one micro-batch: dedup against the store and within the
    * batch, append survivors and their fingerprints; returns the number
    * of documents admitted. Callable directly with a static DataFrame
    * (the reference's testability seam for foreachBatch logic). */
  def applyBatch(batch: DataFrame, corpus: LakeTable, fps: LakeTable): Long = {
    val spark = batch.sparkSession
    val known =
      if (fps.exists) fps.read
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], FpSchema)
    // read twice (corpus append + fingerprint projection): stage once
    val fresh = Dedup.incrementalDedup(batch, known)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val admitted = fresh.count()
    if (admitted > 0) {
      if (corpus.exists) corpus.append(fresh) else corpus.createOrReplace(fresh)
      val newFps = Dedup.fingerprints(fresh)
      if (fps.exists) fps.append(newFps) else fps.createOrReplace(newFps)
    }
    fresh.unpersist(false)
    admitted
  }

  /** Drain all available input (availableNow + checkpoint, the CDC
    * pipeline's trigger discipline) through applyBatch. */
  def runIngest(
      stream: DataFrame,
      corpus: LakeTable,
      fps: LakeTable,
      checkpoint: String,
      queryName: String = "doc-ingest"): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, corpus, fps); ()
      }
      .start()
}
