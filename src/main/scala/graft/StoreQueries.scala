package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.LakeCatalog

/** Oracle-checked end-to-end queries over the LakeTable store: each one
  * CREATES a real versioned table on disk, applies MERGE/DELETE commits,
  * and returns the re-read final state. The DuckDB oracle expresses the
  * same net transformation relationally — if the store's snapshot
  * isolation, COW rewrite, or partition pruning were wrong, the hashes
  * would diverge.
  */
object StoreQueries {

  import SparkEntry.table

  private def warehouse(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_warehouse_$tag"

  /** c06: full lifecycle on an unpartitioned table —
    * RTAS → MERGE (update evens) → DELETE (multiples of 7) → read. */
  private def c06(s: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(s, warehouse(dir.replaceAll("[^a-z0-9]", "_")))
    cat.createDatabase("lake")
    val t = cat.table("lake.orders_e2e")
    val base = table(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    t.createOrReplace(base)
    val source = base
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") + 1000.0, 2))
      .withColumn("o_orderstatus", lit("U"))
    t.mergeInto(source, Seq("o_orderkey"))
    t.deleteWhereExists(
      base.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
      Seq("o_orderkey"))
    t.read.orderBy("o_orderkey")
  }

  /** c07: same lifecycle on a year-partitioned table, exercising the
    * partition-pruned copy-on-write path: the merge/delete batches touch
    * a single year, so only that partition is rewritten — the shape a
    * date-partitioned CDC target has at 100 TB (a micro-batch rewrites
    * the recent partitions, never the table). */
  private def c07(s: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(s, warehouse(dir.replaceAll("[^a-z0-9]", "_")))
    cat.createDatabase("lake")
    val t = cat.table("lake.orders_part")
    val base = table(s, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
    t.createOrReplace(base, partitionBy = Seq("o_year"))
    // both batches confined to one partition: COW rewrites 1 of N years
    val source = base
      .filter(col("o_orderkey") % 50 === 1 && col("o_year") === "1995")
      .withColumn("o_orderstatus", lit("M"))
    t.mergeInto(source, Seq("o_orderkey"))
    t.deleteWhereExists(
      base.filter(col("o_orderkey") % 50 === 2 && col("o_year") === "1995"),
      Seq("o_orderkey"))
    t.read
      .select("o_orderkey", "o_orderstatus", "o_year")
      .orderBy("o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c06_lake_merge_delete" -> (c06 _),
    "c07_lake_partitioned_cow" -> (c07 _)
  )

  def oracleSql: Map[String, String] = Map(
    "c06_lake_merge_delete" ->
      """SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 2 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 2 = 0 THEN round(o_totalprice + 1000.0, 2)
              ELSE o_totalprice END AS o_totalprice
         FROM orders WHERE o_orderkey % 7 <> 0
         ORDER BY o_orderkey""",
    "c07_lake_partitioned_cow" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey % 50 = 1 AND strftime(o_orderdate, '%Y') = '1995'
              THEN 'M' ELSE o_orderstatus END AS o_orderstatus,
         strftime(o_orderdate, '%Y') AS o_year
         FROM orders
         WHERE NOT (o_orderkey % 50 = 2 AND strftime(o_orderdate, '%Y') = '1995')
         ORDER BY o_orderkey"""
  )
}
