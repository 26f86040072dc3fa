package graft.cdc

import java.sql.{Date => SqlDate, Timestamp => SqlTs}
import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Semantic-cast behavior locked to `cdc_pipeline.py:78-124`, using the
  * wire values of the reference's golden CDC message
  * (`/root/reference/resources/debezium_cdc_value.json`). */
class DebeziumCastSpec extends SparkSpec {

  import DebeziumCast._

  private def one(value: Any, dt: DataType, dbzType: String): Any = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(value)),
      StructType(Seq(StructField("v", dt, nullable = true))))
    df.select(castColumn(col("v"), dbzType).as("r")).head.get(0)
  }

  test("Date: int days since epoch → DateType") {
    // golden message DATE1 = 19136
    one(19136, IntegerType, Date) shouldBe
      SqlDate.valueOf(LocalDate.ofEpochDay(19136))
    one(0, IntegerType, Date) shouldBe SqlDate.valueOf(LocalDate.ofEpochDay(0))
    assert(one(null, IntegerType, Date) == null)
  }

  test("MicroTime: µs since midnight → timestamp on 1970-01-01") {
    // golden message TIME1 = 19689000000 µs = 05:28:09
    one(19689000000L, LongType, MicroTime) shouldBe
      SqlTs.valueOf("1970-01-01 05:28:09")
    assert(one(null, LongType, MicroTime) == null)
  }

  test("Timestamp: ms epoch, Asia/Seoul wall clock → UTC (-9h)") {
    // golden message DATETIME1 = 1584598489000
    val r = one(1584598489000L, LongType, Timestamp).asInstanceOf[SqlTs]
    r.getTime shouldBe 1584598489000L - 9L * 3600 * 1000
  }

  test("Timestamp: zero-guard — Avro default:0 decodes to NULL, not epoch") {
    assert(one(0L, LongType, Timestamp) == null)
    assert(one(null, LongType, Timestamp) == null)
  }

  test("MicroTimestamp: µs epoch, Asia/Seoul → UTC, µs precision kept") {
    // golden message CREATE_DATETIME = 1651942920734645
    val r = one(1651942920734645L, LongType, MicroTimestamp).asInstanceOf[SqlTs]
    val expectedMicros = 1651942920734645L - 9L * 3600 * 1000000
    (r.getTime / 1000) * 1000000 + r.getNanos / 1000 shouldBe expectedMicros
    assert(one(0L, LongType, MicroTimestamp) == null)
  }

  test("ZonedTimestamp and unknown types pass through untouched") {
    one("2025-09-24T02:17:49.557813Z", StringType, ZonedTimestamp) shouldBe
      "2025-09-24T02:17:49.557813Z"
    one("plain", StringType, "string") shouldBe "plain"
    one(42, IntegerType, "") shouldBe 42
  }

  test("conformToCatalog: semantic cast then catalog-type cast, extras kept") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(19136, 1584598489000L, "x", 7L)).asJava,
      StructType(Seq(
        StructField("d", IntegerType),
        StructField("ts", LongType),
        StructField("s", StringType),
        StructField("__offset", LongType))))
    val catalog = StructType(Seq(
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("s", StringType)))
    val dbz = Map("d" -> Date, "ts" -> Timestamp)
    val out = DebeziumCast.conformToCatalog(df, catalog, dbz, Seq("__offset"))
    out.schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe Seq(
      ("d", DateType), ("ts", TimestampType), ("s", StringType),
      ("__offset", LongType))
    val row = out.head
    row.getDate(0) shouldBe SqlDate.valueOf(LocalDate.ofEpochDay(19136))
    row.getLong(3) shouldBe 7L
  }

  test("catalog cast narrows types the semantic pass left wide") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(123L)).asJava,
      StructType(Seq(StructField("n", LongType))))
    val catalog = StructType(Seq(StructField("n", IntegerType)))
    val out = DebeziumCast.conformToCatalog(df, catalog, Map.empty)
    out.schema("n").dataType shouldBe IntegerType
    out.head.getInt(0) shouldBe 123
  }
}
