package graft.validate

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.jdbc.{DbSettings, MySqlManager, StubExecutor}
import graft.store.LakeCatalog

class SchemaValidateSpec extends SparkSpec {

  import SchemaValidate._

  private val lakeSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("amount", DecimalType(12, 2), nullable = true),
    StructField("last_applied_date", TimestampType),
    StructField("id_iceberg", StringType)))

  test("clean comparison yields no findings; meta columns excluded") {
    compareColumns(
      Seq(("id", "int(11)"), ("name", "varchar(50)"), ("amount", "decimal(12,2)")),
      lakeSchema, "mysql") shouldBe Nil
  }

  test("count, unreflected, order and type findings") {
    val f1 = compareColumns(
      Seq(("id", "int"), ("name", "varchar(50)"), ("amount", "decimal(12,2)"),
        ("extra", "text")),
      lakeSchema, "mysql")
    f1.map(_.check) should contain allOf ("column_count", "unreflected")

    val f2 = compareColumns(
      Seq(("name", "varchar(50)"), ("id", "int"), ("amount", "decimal(12,2)")),
      lakeSchema, "mysql")
    f2.map(_.check) should contain("column_order")

    val f3 = compareColumns(
      Seq(("id", "bigint"), ("name", "varchar(50)"), ("amount", "decimal(12,2)")),
      lakeSchema, "mysql")
    f3.map(_.check) should contain("type")
    f3.find(_.check == "type").get.message should include("'id'")
  }

  test("nullable parity") {
    compareNullable(Map("id" -> false, "name" -> true), lakeSchema) shouldBe Nil
    val f = compareNullable(Map("id" -> true), lakeSchema)
    f.head.check shouldBe "nullable"
    f.head.message should include("id(source=true, table=false)")
  }

  test("primary key vs id_iceberg presence") {
    comparePrimaryKeys(Seq("id"), lakeSchema) shouldBe Nil
    comparePrimaryKeys(Nil, lakeSchema).head.check shouldBe "primary_key"
    val noId = StructType(lakeSchema.fields.filterNot(_.name == "id_iceberg"))
    comparePrimaryKeys(Seq("id"), noId).head.check shouldBe "primary_key"
    comparePrimaryKeys(Nil, noId) shouldBe Nil
  }

  test("column comment sync plan: only changed, existing, non-empty") {
    val plan = columnCommentSyncPlan(
      Map("id" -> "PK", "name" -> "이름", "ghost" -> "x", "amount" -> ""),
      lakeSchema,
      currentComments = Map("id" -> "PK"))
    plan shouldBe Seq("name" -> "이름")
  }

  test("validateAll wires manager + table and persists comments") {
    import spark.implicits._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sv").toString)
    cat.createDatabase("svc_shop")
    val t = cat.table("svc_shop.users")
    t.createOrReplace(
      Seq((1, "a", "h1")).toDF("id", "name", "id_iceberg"))

    val exec = new StubExecutor(spark)
      .on("COLUMN_TYPE", Seq(("id", "int(11)"), ("name", "varchar(50)"))
        .toDF("COLUMN_NAME", "COLUMN_TYPE"))
      .on("IS_NULLABLE", Seq(("id", "NO"), ("name", "NO"))
        .toDF("COLUMN_NAME", "IS_NULLABLE"))
      .on("KEY_COLUMN_USAGE", Seq("id").toDF("COLUMN_NAME"))
      .on("COLUMN_COMMENT", Seq(("id", "the pk"), ("name", ""))
        .toDF("COLUMN_NAME", "COLUMN_COMMENT"))
      .on("TABLE_COMMENT", Seq("user master").toDF("TABLE_COMMENT"))
    val m = new MySqlManager(DbSettings("mysql", "h", 3306, "u", "p"), exec)

    val findings = SchemaValidate.validateAll(m, "shop.users", t)
    // source declares name NOT NULL; the table column is nullable
    findings.map(_.check) shouldBe Seq("nullable")
    findings.head.message should include("name(source=false, table=true)")
    t.properties("comment.col.id") shouldBe "the pk"
    t.properties("comment") shouldBe "user master"
    SchemaValidate.columnCommentsOf(t) shouldBe Map("id" -> "the pk")

    // second run: comments unchanged → no new property commits
    val v = t.currentSnapshot.get.version
    SchemaValidate.validateAll(m, "shop.users", t)
    t.currentSnapshot.get.version shouldBe v
  }
}
