package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational MERGE / DELETE semantics as pure DataFrame plans.
  *
  * The reference expresses upserts as Iceberg `MERGE INTO ... WHEN MATCHED
  * UPDATE ... WHEN NOT MATCHED INSERT` (`src/utils/cdc_pipeline.py:220-237`)
  * and deletes as `DELETE ... WHERE EXISTS` (`cdc_pipeline.py:239-251`).
  * Iceberg's copy-on-write planner rewrites those into exactly the joins
  * below; we express the joins directly so they run on any table store
  * (our LakeTable uses them for the rewrite step).
  *
  * Scale notes:
  *  - `upsert` is one equi-join on the key. When the source (a CDC
  *    micro-batch) is small relative to the target — the normal case —
  *    Catalyst/AQE broadcasts it, so the target is scanned once with no
  *    shuffle. LakeTable additionally prunes target FILES whose key range
  *    cannot match (Iceberg-style file skipping) before this join runs.
  *  - both anti joins are null-safe on our synthetic `id_iceberg` key
  *    (md5 hex is never null when PKs are non-null).
  */
object Merge {

  /** MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT * — i.e. source rows win, unmatched
    * target rows survive. Source must already be deduplicated to one row
    * per key (the CDC path guarantees this via latest-offset dedup).
    */
  private def keyed(df: DataFrame, keys: Seq[String], hint: Boolean): DataFrame = {
    val k = df.select(keys.map(col): _*)
    if (hint) broadcast(k) else k
  }

  /** MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT * — i.e. source rows win, unmatched
    * target rows survive. Source must already be deduplicated to one row
    * per key (the CDC path guarantees this via latest-offset dedup).
    * `broadcastSource=true` (default) fits the CDC shape: micro-batch vs
    * big target; pass false when merging two large tables so Catalyst
    * plans a shuffled join instead of OOMing the driver.
    */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      broadcastSource: Boolean = true): DataFrame = {
    val survivors = target.join(keyed(source, keys, broadcastSource), keys, "left_anti")
    source.select(target.columns.map(col).toIndexedSeq: _*).unionByName(survivors)
  }

  /** DELETE FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.key = t.key):
    * rows of `target` whose key appears in `deletes` are removed. */
  def deleteMatching(
      target: DataFrame,
      deletes: DataFrame,
      keys: Seq[String],
      broadcastDeletes: Boolean = true): DataFrame =
    target.join(keyed(deletes, keys, broadcastDeletes), keys, "left_anti")

  /** Rows of `target` whose key DOES appear in `probe` (WHERE EXISTS). */
  def semiMatching(
      target: DataFrame,
      probe: DataFrame,
      keys: Seq[String],
      broadcastProbe: Boolean = true): DataFrame =
    target.join(keyed(probe, keys, broadcastProbe), keys, "left_semi")
}
