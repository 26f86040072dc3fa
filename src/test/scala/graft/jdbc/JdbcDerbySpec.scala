package graft.jdbc

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned JDBC reads against a REAL database — embedded Derby
  * (ships with Spark). Complements JdbcSpec's plan-level unit tests:
  * here the range split actually executes, one query per partition. */
class JdbcDerbySpec extends SparkSpec {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val Url = "jdbc:derby:memory:graft_spec"

  private lazy val opts = {
    Class.forName(Driver)
    val conn = DriverManager.getConnection(Url + ";create=true")
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE t") catch { case _: java.sql.SQLException => () }
      st.executeUpdate("CREATE TABLE t (id BIGINT PRIMARY KEY, v DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO t VALUES (?, ?)")
      (1L to 100L).foreach { i => ps.setLong(1, i); ps.setDouble(2, i * 1.5); ps.addBatch() }
      ps.executeBatch()
      ps.close(); st.close()
    } finally conn.close()
    Map("url" -> Url, "driver" -> Driver)
  }

  test("range-partitioned read splits into numPartitions and loses no rows") {
    val plan = JdbcReader.ReadPlan(opts, "t",
      Some(JdbcReader.Partitioning("ID", "1", "100", 4)))
    val df = JdbcReader.load(spark, plan)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 100L
    df.agg(sum(col("ID"))).head().getLong(0) shouldBe 5050L
  }

  test("unpartitioned plan reads the whole table through one connection") {
    val df = JdbcReader.load(spark, JdbcReader.ReadPlan(opts, "t", None))
    df.rdd.getNumPartitions shouldBe 1
    df.count() shouldBe 100L
  }

  test("source-side aggregation pushes through the query option") {
    val row = spark.read.format("jdbc").options(opts)
      .option("query", "SELECT min(id) AS lo, max(id) AS hi, count(*) AS n FROM t")
      .load().head()
    val vals = (0 to 2).map(i => row.get(i).asInstanceOf[Number].longValue())
    vals shouldBe Seq(1L, 100L, 100L)
  }
}
