package graft

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jdbc.JdbcReader

/** End-to-end JDBC source queries against an EMBEDDED Derby database
  * (the derby jars ship with Spark — no extra dependency): a testdata
  * subset is loaded into Derby over plain JDBC, then read back through
  * the engine's partitioned JDBC scan — a REAL
  * `spark.read.format("jdbc")` range split issuing one range-predicated
  * query per partition, plus a real source-side bounds aggregation
  * pushed through the `query` option (`database.py:442-492` semantics).
  *
  * In-memory Derby lives in the driver JVM, which `local[*]` executor
  * threads share; on a real cluster the identical plan points at a
  * network database — the plan shape, not the endpoint, is what is
  * under test here.
  */
object JdbcQueries {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def url(tag: String) = s"jdbc:derby:memory:graft_$tag"

  /** (Re)load the orders subset (o_orderkey % 10 = 0) into Derby —
    * idempotent: drop-and-recreate, batched inserts. */
  private def loadOrders(s: SparkSession, dir: String, tag: String): Unit = {
    Class.forName(Driver)
    val conn = DriverManager.getConnection(url(tag) + ";create=true")
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE orders_jdbc")
      catch { case _: java.sql.SQLException => () } // first run: no table
      st.executeUpdate(
        "CREATE TABLE orders_jdbc (" +
          "o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT, o_totalprice DOUBLE)")
      st.close()
      val rows = SparkEntry.table(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect()
      val ps = conn.prepareStatement("INSERT INTO orders_jdbc VALUES (?, ?, ?)")
      conn.setAutoCommit(false)
      var i = 0
      rows.foreach { r =>
        ps.setLong(1, r.getLong(0))
        ps.setLong(2, r.getLong(1))
        ps.setDouble(3, r.getDouble(2))
        ps.addBatch()
        i += 1
        if (i % 1000 == 0) ps.executeBatch()
      }
      ps.executeBatch()
      conn.commit()
      ps.close()
    } finally conn.close()
  }

  private[graft] def options(tag: String): Map[String, String] =
    Map("url" -> url(tag), "driver" -> Driver)

  private[graft] def prepare(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^a-z0-9]", "_")
    loadOrders(s, dir, tag)
    tag
  }

  /** c16: partitioned JDBC scan — source-side min/max bounds through the
    * `query` pushdown, then a 4-way range split on the key. Derby
    * uppercases unquoted identifiers, so the projection re-aliases. */
  private def c16(s: SparkSession, dir: String): DataFrame = {
    val tag = prepare(s, dir)
    val opts = options(tag)
    val b = s.read.format("jdbc").options(opts)
      .option("query",
        "SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders_jdbc")
      .load().head()
    val plan = JdbcReader.ReadPlan(opts, "orders_jdbc",
      Some(JdbcReader.Partitioning(
        "O_ORDERKEY", b.get(0).toString, b.get(1).toString, 4)))
    JdbcReader.load(s, plan)
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_TOTALPRICE").as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c16_jdbc_partitioned" -> (c16 _))

  def oracleSql: Map[String, String] = Map(
    "c16_jdbc_partitioned" ->
      // the net effect of load-into-derby + partitioned read-back is the
      // identity on the subset: values round-trip exactly (BIGINT/DOUBLE)
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""")
}
