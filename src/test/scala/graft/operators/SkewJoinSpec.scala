package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // pathological skew: 100 of 103 rows share key 1
  private def facts = ((1 to 100).map(i => (i.toLong, 1L)) ++
    Seq((101L, 2L), (102L, 3L), (103L, 2L))).toDF("row_id", "k")
  private def dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused"))
    .toDF("dk", "v")

  test("salted join result equals the plain inner join") {
    val plain = facts.join(dim, $"k" === $"dk")
      .select("row_id", "k", "dk", "v")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedInnerJoin(facts, dim, "k", "dk", saltFrom = "row_id", buckets = 8)
      .select("row_id", "k", "dk", "v")
      .collect().map(_.toSeq).sortBy(_.toString)
    salted shouldBe plain
  }

  test("hot key spreads across multiple salt values") {
    val salts = facts
      .withColumn("__salt", pmod(hash($"row_id"), lit(8)))
      .filter($"k" === 1L)
      .select("__salt").distinct().count()
    salts should be > 4L // 100 rows over 8 buckets: near-uniform spread
  }

  test("dim side fans out exactly buckets times, unmatched keys drop out") {
    val out = SkewJoin.saltedInnerJoin(facts, dim, "k", "dk", saltFrom = "row_id", buckets = 8)
    out.count() shouldBe 103L // inner-join cardinality preserved
    out.filter($"v" === "unused").count() shouldBe 0L
    out.columns should not contain "__salt"
  }

  test("buckets = 1 degrades to the plain join") {
    SkewJoin.saltedInnerJoin(facts, dim, "k", "dk", saltFrom = "row_id", buckets = 1)
      .count() shouldBe 103L
  }

  test("rejects buckets < 1") {
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedInnerJoin(facts, dim, "k", "dk", "row_id", buckets = 0)
  }
}
