package org.apache.spark.util

/** Compile-checked bridge into Spark's `private[spark]` accumulator
  * registry (`AccumulatorContext`, AccumulatorV2.scala) — the one-file
  * package-placement idiom OSS Spark extensions use for internals the
  * public API does not expose.
  *
  * Why the store needs it: committer-v2 harvest validation
  * ([[org.apache.spark.sql.SparkSession]]-side, see
  * `graft.store.LakeTable.committedFileCount`) must read the write
  * job's own committed-file count ("number of written files",
  * `BasicWriteJobStatsTracker.NUM_FILES_KEY`). That SQLMetric is SET
  * SYNCHRONOUSLY on the driver before `df.write` returns
  * (`FileFormatWriter.write` → `processStats`, from per-task stats
  * returned only by task attempts whose commit the coordinator
  * accepted) — but every REPORTING channel for it rides the async
  * listener bus (SQL status store, QueryExecutionListener), which
  * under a busy session lags by SECONDS. Polling the status store
  * coupled every store commit's wall-clock to diagnostics-bus drain
  * latency — measured 4–6× inflation on stream-heavy benches. Reading
  * the accumulator itself is wait-free: the value is already there
  * when the write returns.
  *
  * Ids are monotonic ([[AccumulatorContext.newId]]), so a watermark
  * taken before the write brackets exactly the accumulators the write
  * created; the registry holds weak references, so a scan must
  * tolerate collected entries (the caller fails open on None/empty).
  */
object GraftAccumulatorGate {

  /** Monotonic id watermark: every accumulator registered after this
    * call has a strictly larger id. (Consumes one id — harmless.) */
  def idWatermark(): Long = AccumulatorContext.newId()

  /** Values of all driver-side long accumulators named `name`
    * registered since `watermark` and still reachable. Bounded by the
    * ids one bracketed action created (tens), not the session total. */
  def namedLongsSince(watermark: Long, name: String): Seq[Long] = {
    val hi = AccumulatorContext.newId()
    ((watermark + 1) until hi).flatMap { id =>
      AccumulatorContext.get(id).filter(_.name.contains(name)).flatMap { acc =>
        acc.value match {
          case l: java.lang.Long => Some(l.longValue())
          case i: java.lang.Integer => Some(i.longValue())
          case _ => None
        }
      }
    }
  }
}
