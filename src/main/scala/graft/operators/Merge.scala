package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational MERGE / DELETE semantics as pure DataFrame plans.
  *
  * The reference expresses upserts as Iceberg `MERGE INTO ... WHEN MATCHED
  * UPDATE ... WHEN NOT MATCHED INSERT` (`src/utils/cdc_pipeline.py:220-237`)
  * and deletes as `DELETE ... WHERE EXISTS` (`cdc_pipeline.py:239-251`).
  * Iceberg's copy-on-write planner rewrites those into exactly the joins
  * below; we express the joins directly so they run on any table store.
  * `graft.store.LakeTable.mergeInto/deleteWhereExists` use these plans for
  * their copy-on-write rewrite step.
  *
  * Scale notes:
  *  - `upsert` is one equi-join on the key. Join strategy is left to
  *    Catalyst/AQE by default: a CDC micro-batch source lands under the
  *    broadcast threshold and is auto-broadcast, while two large tables
  *    plan a shuffled join instead of OOMing the driver. Callers that KNOW
  *    the source is micro-batch-small may pass `broadcastSource=true` to
  *    pin the hint.
  *  - both anti joins are null-safe on our synthetic `id_iceberg` key
  *    (md5 hex is never null when PKs are non-null).
  */
object Merge {

  private def keyed(df: DataFrame, keys: Seq[String], hint: Boolean): DataFrame = {
    val k = df.select(keys.map(col): _*)
    if (hint) broadcast(k) else k
  }

  /** MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT * — i.e. source rows win, unmatched
    * target rows survive. Source must already be deduplicated to one row
    * per key (the CDC path guarantees this via latest-offset dedup).
    * `broadcastSource=false` (default) lets Catalyst/AQE pick the join
    * strategy from actual sizes; set true only for known-small sources.
    */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      broadcastSource: Boolean = false): DataFrame = {
    val survivors = target.join(keyed(source, keys, broadcastSource), keys, "left_anti")
    source.select(target.columns.map(col).toIndexedSeq: _*).unionByName(survivors)
  }

  /** DELETE FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.key = t.key):
    * rows of `target` whose key appears in `deletes` are removed. */
  def deleteMatching(
      target: DataFrame,
      deletes: DataFrame,
      keys: Seq[String],
      broadcastDeletes: Boolean = false): DataFrame =
    target.join(keyed(deletes, keys, broadcastDeletes), keys, "left_anti")

  /** Rows of `target` whose key DOES appear in `probe` (WHERE EXISTS). */
  def semiMatching(
      target: DataFrame,
      probe: DataFrame,
      keys: Seq[String],
      broadcastProbe: Boolean = false): DataFrame =
    target.join(keyed(probe, keys, broadcastProbe), keys, "left_semi")

  /** Backward AS-OF join: each left row picks up the LATEST right row
    * with `right.ts <= left.ts` for the same key (inclusive at equal
    * timestamps), or nulls when no prior right row exists — the
    * time-series state-attachment join (quotes→trades, config→events).
    *
    * Spark has no asof operator, and the naive form (range join +
    * latest-per-pair dedup) explodes: every left row pairs with its
    * ENTIRE right history before the window discards all but one. This
    * plan instead UNIONS the tagged sides and takes one running
    * `last(·, ignoreNulls)` per key over the merged time order —
    * exactly one shuffle on the key, state O(1) per row, zero
    * intermediate blow-up, skew-safe (a hot key costs one partition's
    * sort, same as any windowed op).
    *
    * Right rows sort BEFORE left rows at the same timestamp (side 0 vs
    * 1), which is what makes the join inclusive. The right values
    * travel as ONE struct, so a null inside a right row is carried
    * as-is rather than ignoreNulls-skipping to an older row. `rightVals`
    * must not collide with left column names.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val rightU = right.select(
      keyCols ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightVals.map(col): _*).as("__r")): _*)
    val leftU = left.select(
      col("*"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(rightU.schema("__r").dataType).as("__r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Long.MinValue, 0)
    leftU.unionByName(rightU, allowMissingColumns = true)
      .withColumn("__m", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightVals.map(v => col(s"__m.$v").as(v)): _*)
  }
}
