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

  /** (Re)load the pipeline source table into Derby: the orders subset
    * with SPACE-PADDED status strings (the trim target) — the shape a
    * real OLTP source hands the ingest pipeline. Idempotent. */
  private def loadPipeSource(s: SparkSession, dir: String, tag: String): Unit = {
    Class.forName(Driver)
    val conn = DriverManager.getConnection(url(tag) + ";create=true")
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE orders_pipe")
      catch { case _: java.sql.SQLException => () }
      st.executeUpdate(
        "CREATE TABLE orders_pipe (" +
          "o_orderkey BIGINT PRIMARY KEY, o_orderstatus VARCHAR(10), " +
          "o_totalprice DOUBLE)")
      st.close()
      val rows = SparkEntry.table(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
      val ps = conn.prepareStatement("INSERT INTO orders_pipe VALUES (?, ?, ?)")
      conn.setAutoCommit(false)
      var i = 0
      rows.foreach { r =>
        ps.setLong(1, r.getLong(0))
        ps.setString(2, s"  ${r.getString(1)} ") // whitespace the pipeline trims
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

  /** c34: the reference's batch pipeline COMPOSED end-to-end — a
    * partitioned JDBC scan of the OLTP source, trim-all-strings, the
    * MD5 composite-PK identity column, RTAS into a LakeTable, then an
    * UPDATE lands in the source and the changed slice (a source-side
    * pushdown query) merges incrementally into the lake table. The
    * oracle replays the net transformation relationally; any defect in
    * the scan split, trim, hash derivation, RTAS or MERGE diverges. */
  private def c34(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Transforms
    import graft.store.LakeCatalog
    val tag = dir.replaceAll("[^a-z0-9]", "_")
    loadPipeSource(s, dir, tag)
    val opts = options(tag)
    def conformed(df: DataFrame): DataFrame =
      Transforms.withPkHash(
        Transforms.trimStringColumns(df.select(
          col("O_ORDERKEY").as("o_orderkey"),
          col("O_ORDERSTATUS").as("o_orderstatus"),
          col("O_TOTALPRICE").as("o_totalprice"))),
        Seq("o_orderkey", "o_orderstatus"))
    val b = s.read.format("jdbc").options(opts)
      .option("query",
        "SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders_pipe")
      .load().head()
    val initial = conformed(JdbcReader.load(s, JdbcReader.ReadPlan(
      opts, "orders_pipe",
      Some(JdbcReader.Partitioning(
        "O_ORDERKEY", b.get(0).toString, b.get(1).toString, 4)))))
    val wh = s"${sys.props("java.io.tmpdir")}/graft_warehouse_${tag}_jp"
    val cat = new LakeCatalog(s, wh)
    cat.createDatabase("lake")
    val t = cat.table("lake.orders_ingest")
    t.createOrReplace(initial)
    // the source moves on: an OLTP update lands...
    val conn = DriverManager.getConnection(url(tag))
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "UPDATE orders_pipe SET o_totalprice = o_totalprice + 1000.0 " +
          "WHERE MOD(o_orderkey, 20) = 0")
      st.close()
    } finally conn.close()
    // ...and ONLY the changed slice is pulled back (source-side
    // pushdown query) and upserted — the incremental cadence
    val changed = conformed(s.read.format("jdbc").options(opts)
      .option("query",
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_pipe " +
          "WHERE MOD(o_orderkey, 20) = 0")
      .load())
      .withColumn("o_totalprice", round(col("o_totalprice"), 2))
    t.mergeInto(changed, Seq("o_orderkey"))
    t.read.orderBy("o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c16_jdbc_partitioned" -> (c16 _),
    "c34_jdbc_lake_pipeline" -> (c34 _))

  def oracleSql: Map[String, String] = Map(
    "c16_jdbc_partitioned" ->
      // the net effect of load-into-derby + partitioned read-back is the
      // identity on the subset: values round-trip exactly (BIGINT/DOUBLE)
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""",
    "c34_jdbc_lake_pipeline" ->
      // net transformation: the %10 subset, statuses trimmed back to the
      // originals, %20 keys re-priced by the source update (+1000.0,
      // rounded like the pipeline), identity = md5 of key|status
      """SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 20 = 0
                THEN round(o_totalprice + 1000.0, 2)
                ELSE o_totalprice END AS o_totalprice,
           md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus)
             AS id_iceberg
         FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""")
}
