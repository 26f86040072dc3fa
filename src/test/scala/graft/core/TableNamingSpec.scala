package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TableNamingSpec extends AnyFunSuite with Matchers {

  test("topic prefix.schema.table → lowercased {service}_{schema}.table") {
    TableNaming.topicToTable("SVC", "pfx.Store.TB_UPPER") shouldBe
      (("svc_store", "tb_upper"))
    // extra prefix segments: last two win (cdc_pipeline.py:259-262)
    TableNaming.topicToTable("svc", "a.b.Schema.Table") shouldBe
      (("svc_schema", "table"))
    intercept[IllegalArgumentException](TableNaming.topicToTable("svc", "just.two"))
  }

  test("mysql db.table and sqlserver db.schema.table forms") {
    TableNaming.mysqlSourceToTable("Svc", "Shop.Users") shouldBe
      (("svc_shop", "users"))
    intercept[IllegalArgumentException](
      TableNaming.mysqlSourceToTable("svc", "db.schema.table"))
    TableNaming.sqlServerSourceToTable("svc", "Shop.dbo.Users") shouldBe
      (("svc_shop", "users"))
    intercept[IllegalArgumentException](
      TableNaming.sqlServerSourceToTable("svc", "shop.users"))
  }

  test("per-topic checkpoint path layout") {
    TableNaming.checkpointPath("s3a://bkt/iceberg", "dag1", "p.s.t") shouldBe
      "s3a://bkt/iceberg/checkpoint/dag1/p.s.t"
  }

  test("sql literal escaping doubles quotes, null-safe") {
    SqlLiteral.escape("it's") shouldBe "it''s"
    SqlLiteral.escape(null) shouldBe ""
    SqlLiteral.quote("o'brien; DROP") shouldBe "'o''brien; DROP'"
  }
}
