package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class RollingHashSpec extends SparkSpec {

  import spark.implicits._

  private def ref(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31L + (b & 0xff)) & 0x7fffffffL)

  test("matches the byte-wise reference fold (codegen path)") {
    val in = Seq("hello world", "", "a", "The quick brown fox", "né çà 中文")
    val out = in.toDF("s")
      .select(TextFunctions.rollingHash($"s").as("rh"))
      .collect().map(_.getLong(0))
    out.toSeq shouldBe in.map(ref)
  }

  test("interpreted eval agrees with codegen") {
    val strings = Seq("hello world", "", "graft", "中文 bytes")
    strings.foreach { s =>
      RollingHash(Literal(s)).eval() shouldBe ref(s)
    }
  }

  test("null input yields null, empty string yields 0") {
    val out = Seq(Some("x"), None, Some("")).toDF("s")
      .select(TextFunctions.rollingHash($"s").as("rh")).collect()
    out(1).isNullAt(0) shouldBe true
    out(2).getLong(0) shouldBe 0L
  }

  test("registered in SQL as graft_rolling_hash") {
    spark.sql("SELECT graft_rolling_hash('hello world') AS rh")
      .collect().head.getLong(0) shouldBe ref("hello world")
  }

  test("stays inside whole-stage codegen (no interpreted fallback in the plan)") {
    val df = spark.range(10)
      .select(TextFunctions.rollingHash($"id".cast("string")).as("rh"))
    // "*(1) Project [...]": the star marks a WholeStageCodegen stage —
    // the expression fused into generated code, no interpreted fallback
    df.queryExecution.executedPlan.toString should include("*(1) Project [graft_rolling_hash")
    df.collect().map(_.getLong(0)).toSeq shouldBe
      (0L until 10L).map(i => ref(i.toString))
  }
}
