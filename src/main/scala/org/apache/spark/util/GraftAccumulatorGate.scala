package org.apache.spark.util

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.internal.Logging

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
  * created. The registry holds WEAK references, and in this Spark
  * line `AccumulatorContext.get` does not throw for a collected entry
  * — it logs and returns None, indistinguishable from an id that was
  * allocated but never registered. That distinction is load-bearing
  * for the caller: skipping a never-registered id is sound, but
  * silently skipping a COLLECTED one could drop the bracketed write's
  * own metric while a smaller concurrent write's survives, and the
  * caller's max-over-candidates would then UNDERCOUNT — turning its
  * surplus check into a false abort of a good commit. So the scan
  * reads the registry map itself (reflective handle below) and
  * abandons wholesale — None, one warning — the moment any bracket
  * entry is found collected; callers fail open on None.
  */
object GraftAccumulatorGate extends Logging {

  /** Reflective handle on `AccumulatorContext.originals` (the registry
    * `ConcurrentHashMap[jl.Long, WeakReference[AccumulatorV2]]`). The
    * field is object-private, so even this package cannot name it in
    * code; core reflection works because the Spark jars live on the
    * classpath (unnamed module — no Java 17 access barrier). Needed
    * only to tell "absent" from "collected" (see class doc); if the
    * field ever drifts, [[namedLongsSince]] returns None — validation
    * disarmed outright, never the pre-r19 per-id scan whose collected
    * entries read as absent (the undercount → false-abort shape). The
    * drift-canary spec turns the suite red on such a Spark, so the
    * fallback's only job is to be SAFE, not useful. */
  private[util] lazy val registry: Option[ConcurrentHashMap[java.lang.Long, WeakReference[AccumulatorV2[_, _]]]] =
    try {
      val f = AccumulatorContext.getClass.getDeclaredField("originals")
      f.setAccessible(true)
      Some(f.get(AccumulatorContext)
        .asInstanceOf[ConcurrentHashMap[java.lang.Long, WeakReference[AccumulatorV2[_, _]]]])
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning("AccumulatorContext.originals not reflectively reachable " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}); registry scans " +
          "cannot distinguish collected entries from absent ids and assume " +
          "the bracketed write's own metric is never collected mid-scan")
        None
    }

  /** Monotonic id watermark: every accumulator registered after this
    * call has a strictly larger id. (Consumes one id — harmless.) */
  def idWatermark(): Long = AccumulatorContext.newId()

  /** Running total of scans abandoned on a collected entry — the
    * fail-open degradations are individually harmless (one write goes
    * unvalidated) but a HIGH RATE means GC pressure is quietly
    * disarming the stray-file net; exposing the count makes that
    * observable (every abandon warning prints the running total, and
    * probes/benches can difference it across a run). Expected shape:
    * ~1 per long session (the r19 bench measured exactly 1 per 193
    * queries); tens per bench would say the net is mostly off. */
  val abandonedScans = new java.util.concurrent.atomic.AtomicLong()

  /** Values of all driver-side long accumulators named `name`
    * registered since `watermark` and still reachable, or None when
    * the scan cannot be trusted. Bounded by the ids one bracketed
    * action created (tens), not the session total.
    *
    * Returns None — after ONE warning, never silently — when any id in
    * the bracket maps to a garbage-collected registry entry: a partial
    * scan could have lost the very metric the caller is validating
    * against while keeping a smaller one, and "no answer" is strictly
    * safer than a plausible wrong answer (callers degrade to their
    * unvalidated behavior on None, never abort).
    *
    * Residual assumption (documented, not checked): an entry that was
    * collected AND already removed by the ContextCleaner reads as
    * absent. For the bracketed write's own metric that window is
    * practically unreachable — the value was set on this thread
    * microseconds ago and removal needs a GC plus a cleaner-queue
    * drain first — and it is the only entry whose loss could skew the
    * caller's max downward. */
  def namedLongsSince(watermark: Long, name: String): Option[Seq[Long]] =
    namedLongsSinceWith(registry, watermark, name)

  /** Registry-parameterized body of [[namedLongsSince]] (spec seam for
    * the drift branch, which cannot be reached on a Spark where the
    * reflective handle resolves). */
  private[util] def namedLongsSinceWith(
      reg: Option[ConcurrentHashMap[java.lang.Long, WeakReference[AccumulatorV2[_, _]]]],
      watermark: Long,
      name: String): Option[Seq[Long]] = {
    val map = reg.getOrElse {
      // Registry handle drifted (a Spark upgrade renamed the field).
      // The pre-r20 fallback ran the per-id `get()` scan, whose
      // collected entries read as ABSENT — exactly the undercount →
      // false-abort shape this gate exists to prevent. The drift
      // canary spec already turns the suite red on such a Spark, so
      // the only job here is to be safe: no answer, callers fail open.
      logWarning("accumulator registry handle unavailable on this Spark; " +
        "write-metric scans are disarmed (callers degrade to their " +
        "unvalidated behavior) — fix GraftAccumulatorGate.registry for " +
        "this Spark line to re-arm harvest validation")
      return None
    }
    val hi = AccumulatorContext.newId()
    val out = Seq.newBuilder[Long]
    var id = watermark + 1
    while (id < hi) {
      val ref = map.get(java.lang.Long.valueOf(id))
      if (ref != null) {
        val acc = ref.get
        if (acc == null) {
          // the collected entry may well be a FOREIGN task-metric
          // accumulator that could never have matched `name`, but its
          // name died with it — abandoning is the only sound move. The
          // running total keeps chronic GC-pressure degradation (net
          // quietly off) distinguishable from the expected ~1/session.
          val total = abandonedScans.incrementAndGet()
          logWarning(s"accumulator registry scan [${watermark + 1}, $hi) " +
            s"abandoned: entry $id was garbage-collected before the scan " +
            "could read it; the caller's harvest validation degrades to " +
            s"unvalidated for this one write (fail-open; $total abandoned " +
            "scans this JVM)")
          return None
        }
        if (acc.name.contains(name)) collectLong(acc, out)
      }
      id += 1
    }
    Some(out.result())
  }

  private def collectLong(acc: AccumulatorV2[_, _], out: scala.collection.mutable.Builder[Long, Seq[Long]]): Unit =
    acc.value match {
      case l: java.lang.Long => out += l.longValue()
      case i: java.lang.Integer => out += i.longValue()
      case _ => ()
    }
}
