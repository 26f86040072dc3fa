package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** The native vector kernels must be BIT-FOR-BIT equal to the HOF
  * reference forms they replaced — any drift would silently move 4dp
  * rounding boundaries and break the oracle gate. */
class VectorExprsSpec extends SparkSpec {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), _ + _)

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    hofDot(a, b) / (norm2(a) * norm2(b))

  private def hofBucket(v: org.apache.spark.sql.Column, planes: Int, firstPlane: Int) =
    concat((0 until planes).map(p => hyperplaneBit(v, firstPlane + p)): _*)

  private val rng = new scala.util.Random(7)
  private def vec(dim: Int): Seq[Float] = Seq.fill(dim)(rng.nextFloat() * 2 - 1)

  private lazy val pairs = (1 to 200)
    .map(i => (i.toLong, vec(64), vec(64)))
    .toDF("id", "a", "b")

  test("graft_dot and graft_cosine are bit-identical to the HOF forms") {
    val out = pairs.select(
      (dot($"a", $"b") === hofDot($"a", $"b")).as("dok"),
      (cosine($"a", $"b") === hofCosine($"a", $"b")).as("cok"))
      .agg(sum(when($"dok" && $"cok", 0).otherwise(1)))
      .head().getLong(0)
    out shouldBe 0L
  }

  test("graft_dot on double arrays (unit-vector verify path) matches HOF") {
    val unit = pairs.select(
      transform(asDouble($"a"), x => x / norm2($"a")).as("ua"),
      transform(asDouble($"b"), x => x / norm2($"b")).as("ub"))
    val bad = unit.select(
      (dotDouble($"ua", $"ub") ===
        aggregate(zip_with($"ua", $"ub", (x, y) => x * y), lit(0.0), _ + _)).as("ok"))
      .filter(!$"ok").count()
    bad shouldBe 0L
  }

  test("graft_lsh_bucket equals the per-plane HOF bucket for several shapes") {
    for ((planes, firstPlane) <- Seq((6, 0), (4, 4), (1, 0), (8, 16))) {
      val bad = pairs.select(
        (lshBucketFrom($"a", planes, firstPlane) ===
          hofBucket($"a", planes, firstPlane)).as("ok"))
        .filter(!$"ok").count()
      withClue(s"planes=$planes firstPlane=$firstPlane: ") { bad shouldBe 0L }
    }
  }

  test("null element, length mismatch, and empty vector edges") {
    val edge = Seq(
      (1L, Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (2L, Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (3L, Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]))
      .toDF("id", "a", "b")
    // dot/cosine: NULL exactly like null-propagating lambda arithmetic
    val r = edge.select($"id", dot($"a", $"b").as("d"), cosine($"a", $"b").as("c"))
      .orderBy("id").collect()
    r.map(x => x.isNullAt(1)) shouldBe Array(true, true, false)
    r.map(x => x.isNullAt(2)) shouldBe Array(true, true, false)
    assert(r(2).getDouble(1) == 0.0) // empty == empty fold seed
    assert(r(2).getDouble(2).isNaN)  // 0/0 like the HOF form
    // bucket: native equals HOF on the edges too, and poisoned
    // projections (null element / empty vector) give the all-'0' bucket,
    // like when(null >= 0, "1").otherwise("0") per plane
    val bkBad = edge.select(
      (lshBucketFrom($"a", 4, 0) === hofBucket($"a", 4, 0)).as("ok"))
      .filter(!$"ok").count()
    bkBad shouldBe 0L
    edge.filter($"id" === 1).select(lshBucketFrom($"a", 4, 0))
      .head().getString(0) shouldBe "0000"
    edge.filter($"id" === 3).select(lshBucketFrom($"a", 4, 0))
      .head().getString(0) shouldBe "0000"
  }
}
