package graft.jdbc

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Stub executor: records every (options, sql) pair and serves canned
  * DataFrames keyed by a substring of the SQL. */
class StubExecutor(spark: org.apache.spark.sql.SparkSession) extends JdbcExecutor {
  val issued = mutable.ArrayBuffer[(Map[String, String], String)]()
  var responses: Seq[(String, DataFrame)] = Nil

  def on(sqlContains: String, df: DataFrame): this.type = {
    responses = responses :+ (sqlContains -> df); this
  }

  def query(options: Map[String, String], sql: String): DataFrame = {
    issued += ((options, sql))
    responses.find { case (frag, _) => sql.contains(frag) }
      .map(_._2)
      .getOrElse(throw new IllegalStateException(s"no stub for: $sql"))
  }
}

class JdbcSpec extends SparkSpec {

  import spark.implicits._

  private val my = DbSettings("mysql", "db.example", 3306, "u", "pw")
  private val ms = DbSettings("sqlserver", "db.example", 1433, "u", "pw")

  test("jdbc options per dialect") {
    val m = new MySqlManager(my, new StubExecutor(spark))
    m.jdbcOptions("shop")("url") should include(
      "jdbc:mysql://db.example:3306/shop?zeroDateTimeBehavior=convertToNull")
    m.jdbcOptions()("driver") shouldBe "com.mysql.cj.jdbc.Driver"

    val s = new SqlServerManager(ms, new StubExecutor(spark))
    s.jdbcOptions("shop")("url") shouldBe
      "jdbc:sqlserver://db.example:1433;databaseName=shop;encrypt=false;"
    s.jdbcOptions()("url") shouldBe "jdbc:sqlserver://db.example:1433;encrypt=false;"
  }

  test("identifier validation blocks injection-shaped names") {
    val m = new MySqlManager(my, new StubExecutor(spark))
    intercept[IllegalArgumentException](m.primaryKey("shop.users; DROP TABLE x"))
    intercept[IllegalArgumentException](m.primaryKey("shop.users'--"))
    intercept[IllegalArgumentException](m.primaryKey("bad"))
    val s = new SqlServerManager(ms, new StubExecutor(spark))
    intercept[IllegalArgumentException](s.primaryKey("db.dbo"))
  }

  test("mysql metadata queries run in the source DB with pushed filters") {
    val exec = new StubExecutor(spark)
      .on("KEY_COLUMN_USAGE", Seq("id", "sub_id").toDF("COLUMN_NAME"))
      .on("COLUMN_TYPE", Seq(("id", "int(11)"), ("name", "varchar(255)"))
        .toDF("COLUMN_NAME", "COLUMN_TYPE"))
      .on("IS_NULLABLE", Seq(("id", "NO"), ("name", "YES"))
        .toDF("COLUMN_NAME", "IS_NULLABLE"))
    val m = new MySqlManager(my, exec)

    m.primaryKey("shop.users") shouldBe Seq("id", "sub_id")
    m.schemaOf("shop.users") shouldBe Seq(("id", "int(11)"), ("name", "varchar(255)"))
    m.nullableInfo("shop.users") shouldBe Map("id" -> false, "name" -> true)
    // every query was pushed with the schema/table filter inline
    exec.issued.map(_._2).foreach { sql =>
      sql should include("TABLE_SCHEMA = 'shop'")
      sql should include("TABLE_NAME = 'users'")
    }
  }

  test("partition key discovery prefers auto_increment") {
    val exec = new StubExecutor(spark)
      .on("auto_increment", Seq("seq_id").toDF("COLUMN_NAME"))
    new MySqlManager(my, exec).partitionKey("shop.users") shouldBe Some("seq_id")

    val none = new StubExecutor(spark)
      .on("auto_increment", spark.emptyDataFrame.select())
    // empty result → no partition key
    val m2 = new MySqlManager(my, new StubExecutor(spark)
      .on("auto_increment", Seq.empty[String].toDF("COLUMN_NAME")))
    m2.partitionKey("shop.users") shouldBe None
  }

  test("read plan: partitioned when bounds exist, fallback when NULL") {
    val exec = new StubExecutor(spark)
      .on("auto_increment", Seq("id").toDF("COLUMN_NAME"))
      .on("min(id)", Seq((5L, 105L)).toDF("lower", "upper"))
    val m = new MySqlManager(my, exec)
    val p = JdbcReader.plan(m, "shop.users", numPartitions = 8)
    p.partition shouldBe Some(JdbcReader.Partitioning("id", "5", "105", 8))
    // bound query used backtick aliasing for mysql
    exec.issued.last._2 should include("`lower`")

    val execNull = new StubExecutor(spark)
      .on("auto_increment", Seq("id").toDF("COLUMN_NAME"))
      .on("min(id)", Seq((Option.empty[Long], Option.empty[Long])).toDF("lower", "upper"))
    JdbcReader.plan(new MySqlManager(my, execNull), "shop.users", 8)
      .partition shouldBe None

    val execNoKey = new StubExecutor(spark)
      .on("auto_increment", Seq.empty[String].toDF("COLUMN_NAME"))
    JdbcReader.plan(new MySqlManager(my, execNoKey), "shop.users", 8)
      .partition shouldBe None
  }

  test("sqlserver bound query quotes aliases with single quotes") {
    val m = new SqlServerManager(ms, new StubExecutor(spark))
    JdbcReader.boundQuery(m, "db.dbo.t", "id") shouldBe
      "SELECT min(id) as 'lower', max(id) as 'upper' FROM db.dbo.t"
  }

  test("sqlserver PK sorted by ordinal position") {
    val exec = new StubExecutor(spark)
      .on("PRIMARY KEY", Seq(("db", "t", "b_col", 2), ("db", "t", "a_col", 1))
        .toDF("TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME", "ORDINAL_POSITION"))
    new SqlServerManager(ms, exec).primaryKey("db.dbo.t") shouldBe
      Seq("a_col", "b_col")
  }
}
