package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity table for `convert_db_type_to_spark`
  * (`/root/reference/src/utils/database.py:75-104`). */
class DbTypeMapSpec extends AnyFunSuite with Matchers {

  private def my(t: String) = DbTypeMap.convertDbTypeToSpark(t, "mysql")
  private def ms(t: String) = DbTypeMap.convertDbTypeToSpark(t, "sqlserver")

  test("mysql basic scalar types") {
    my("varchar(255)") shouldBe StringType
    my("char(36)") shouldBe StringType
    my("longtext") shouldBe StringType
    my("int(11)") shouldBe IntegerType
    my("bigint(20)") shouldBe LongType
    my("float") shouldBe FloatType
    my("double") shouldBe DoubleType
    my("date") shouldBe DateType
    my("datetime(6)") shouldBe TimestampType
    my("timestamp") shouldBe TimestampType
    my("time") shouldBe TimestampType
    my("enum('a','b')") shouldBe StringType
    my("json") shouldBe StringType
    my("mediumblob") shouldBe BinaryType
  }

  test("mysql tinyint(1) is boolean; other tinyints are int") {
    my("tinyint(1)") shouldBe BooleanType
    my("tinyint(1) unsigned") shouldBe BooleanType
    my("tinyint(4)") shouldBe IntegerType
    my("tinyint") shouldBe IntegerType
  }

  test("mysql decimal precision/scale rules") {
    my("decimal(12,2)") shouldBe DecimalType(12, 2)
    my("decimal(38,10)") shouldBe DecimalType(38, 10)
    // decimal(p) → scale 0 (database.py:93-94)
    my("decimal(7)") shouldBe DecimalType(7, 0)
    // bare decimal → MySQL default DECIMAL(10,0)
    my("decimal") shouldBe DecimalType(10, 0)
  }

  test("mysql two-word types and first-word fallback") {
    my("int unsigned") shouldBe LongType
    // "bigint unsigned" has no entry → falls back to "bigint"
    my("bigint unsigned") shouldBe LongType
    my("smallint unsigned") shouldBe IntegerType
  }

  test("unknown types fall back to string") {
    my("geometry") shouldBe StringType
    ms("geography") shouldBe StringType
    my("") shouldBe StringType
  }

  test("sqlserver dialect differences") {
    ms("smallint") shouldBe ShortType
    ms("tinyint") shouldBe ByteType
    ms("bit") shouldBe BooleanType
    ms("decimal(12,2)") shouldBe DecimalType(38, 10) // fixed, not parameterized
    ms("numeric(5)") shouldBe DecimalType(38, 10)
    ms("money") shouldBe DecimalType(19, 4)
    ms("smallmoney") shouldBe DecimalType(10, 4)
    ms("float") shouldBe DoubleType
    ms("real") shouldBe FloatType
    ms("time") shouldBe StringType // NOT timestamp on SQL Server
    ms("datetime2") shouldBe TimestampType
    ms("uniqueidentifier") shouldBe StringType
    ms("xml") shouldBe StringType
    ms("sql_variant") shouldBe StringType
    ms("varbinary(max)") shouldBe BinaryType
  }

  test("case and whitespace insensitive") {
    my("  VARCHAR(10) ") shouldBe StringType
    my("DECIMAL(9,3)") shouldBe DecimalType(9, 3)
    ms("DateTime") shouldBe TimestampType
  }
}
