package graft.store

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides for the store's internal Spark
  * actions.
  *
  * [[bytesFirstCoalesce]]: AQE's partition coalescing defaults to
  * `parallelismFirst=true`, which refuses to coalesce below the
  * session's default parallelism — so every reduce stage of a store
  * probe or merge on an aggregate-sized frame (a rollup delta, a
  * tombstone sweep, a matches scan over a tiny table) launches 32
  * local tasks to move a few dozen records, and a tiny merge's output
  * lands one file per non-empty reduce partition. Bytes-first
  * coalescing (Spark's own recommended production setting for exactly
  * this reason) collapses those to one task sized by
  * `advisoryPartitionSizeInBytes`, while a data-sized store write
  * still splits by bytes — the behavior is scale-adaptive, not a
  * local[32] tune.
  *
  * Deliberately SCOPED to store actions rather than flipped in
  * GraftSession: CPU-heavy tiny-BYTE compute stages (char-ngram dedup,
  * media kernels) would be serialized by a global bytes-first policy
  * (measured and rejected in r21) — the store's commit/probe stages
  * are IO/floor-bound and have no such shape. Nesting is safe (inner
  * scopes restore the outer scope's value); store ops are
  * driver-sequential so the brief session-wide visibility of the
  * override cannot re-plan a concurrent compute query in practice.
  */
private[graft] object StoreConf {
  // canChangeCachedPlanOutputPartitioning: the store persists its
  // aggregate-sized delta/probe frames, and AQE refuses to coalesce
  // shuffle reads under a cached plan unless this is on (the cached
  // partitioning is allowed to differ run-to-run — no store consumer
  // relies on it; correctness is unaffected by definition of the
  // flag, it only unlocks AQE inside InMemoryRelation subtrees).
  private val Overrides = Seq(
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true")

  def bytesFirstCoalesce[A](spark: SparkSession)(body: => A): A = {
    val prev = Overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    Overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
