package graft.cdc

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden-fixture tests against the reference's real Debezium Avro
  * schemas (`/root/reference/resources/debezium_cdc_*_schema.json` — a
  * composite-PK MySQL table covering every Debezium temporal type). */
class DebeziumSchemaSpec extends AnyFunSuite with Matchers {

  private def fixture(name: String): String =
    Files.readString(Paths.get(s"/root/reference/resources/$name"))

  lazy val valueSchema: String = fixture("debezium_cdc_value_schema.json")
  lazy val keySchema: String = fixture("debezium_cdc_key_schema.json")

  test("extracts every column with connect.name preferred over raw type") {
    val m = DebeziumSchema.extract(valueSchema)
    m("id") shouldBe "int"
    m("char36") shouldBe "string"
    m("varchar36") shouldBe "string" // ["null", {string}] union unwrapped
    m("integer1") shouldBe "int"
    m("integer2") shouldBe "long"
    m("unsigned_int") shouldBe "long"
    m("float1") shouldBe "float"
    m("double1") shouldBe "double"
    m("decimal1") shouldBe "org.apache.kafka.connect.data.Decimal"
    m("boolean1") shouldBe "boolean"
    m("BLOB1") shouldBe "bytes"
    m("TEXT1") shouldBe "string"
    m("DATE1") shouldBe "io.debezium.time.Date"
    m("TIME1") shouldBe "io.debezium.time.MicroTime"
    // [T, "null"] union order (connect.default 0) also unwraps to T
    m("DATETIME1") shouldBe "io.debezium.time.Timestamp"
    m("CREATE_DATETIME") shouldBe "io.debezium.time.MicroTimestamp"
    m("UPDATE_TIMESTAMP") shouldBe "io.debezium.time.ZonedTimestamp"
    m.size shouldBe 17
  }

  test("key schema yields PK columns in declared order") {
    DebeziumSchema.keyColumns(keySchema) shouldBe Seq("id", "DATE1", "integer1", "char36")
  }

  test("envelope without before/after record yields empty map") {
    DebeziumSchema.extract("""{"type":"record","name":"X","fields":[
      {"name":"op","type":"string"}]}""") shouldBe Map.empty
    DebeziumSchema.extract("""{}""") shouldBe Map.empty
  }

  test("after-only envelope with record literal on after") {
    val json =
      """{"type":"record","name":"Envelope","fields":[
        {"name":"after","type":["null",{"type":"record","name":"Value","fields":[
          {"name":"a","type":"int"},
          {"name":"b","type":["null",{"type":"long","connect.name":"io.debezium.time.Timestamp"}]}
        ]}]}]}"""
    val m = DebeziumSchema.extract(json)
    m shouldBe Map("a" -> "int", "b" -> "io.debezium.time.Timestamp")
  }
}
