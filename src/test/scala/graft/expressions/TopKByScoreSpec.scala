package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.topKByScore
import graft.operators.Similarity

class TopKByScoreSpec extends SparkSpec {

  import spark.implicits._

  test("keeps the k best by (score desc, id asc), best-first output") {
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.5, 11L), (1L, 0.9, 9L), (1L, 0.7, 12L),
      (2L, 0.1, 20L))
      .toDF("g", "score", "id")
    val out = df.groupBy("g").agg(topKByScore($"score", $"id", 3).as("top"))
      .orderBy("g").collect()
    out(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1))) shouldBe
      Seq((0.9, 9L), (0.9, 10L), (0.7, 12L)) // tie at 0.9 -> lower id first
    out(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1))) shouldBe Seq((0.1, 20L))
  }

  test("partial aggregation across many partitions matches single-partition result") {
    val rows = (1L to 2000L).map(i => (i % 7, (i * 37 % 1009).toDouble, i))
    val many = rows.toDF("g", "score", "id").repartition(16)
      .groupBy("g").agg(topKByScore($"score", $"id", 5).as("top"))
      .orderBy("g").collect().map(_.toString)
    val one = rows.toDF("g", "score", "id").coalesce(1)
      .groupBy("g").agg(topKByScore($"score", $"id", 5).as("top"))
      .orderBy("g").collect().map(_.toString)
    many shouldBe one
  }

  test("non-integer k literal fails analysis cleanly, not with a cast error") {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val agg = TopKByScore(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      Literal(UTF8String.fromString("x"), StringType))
    agg.checkInputDataTypes() shouldBe a[TypeCheckResult.TypeCheckFailure]
  }

  test("null scores and ids are skipped") {
    val df = Seq((1L, Some(0.5), Some(1L)), (1L, None, Some(2L)), (1L, Some(0.9), None))
      .toDF("g", "score", "id")
    val out = df.groupBy("g").agg(topKByScore($"score", $"id", 3).as("top")).collect()
    out.head.getSeq[org.apache.spark.sql.Row](1).length shouldBe 1
  }

  test("plan uses partial HashAggregate (map-side combine before the exchange)") {
    val plan = Seq((1L, 0.5, 1L)).toDF("g", "score", "id")
      .groupBy("g").agg(topKByScore($"score", $"id", 3))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice: partial + final, exchange between
    plan.split("ObjectHashAggregate").length should be >= 3
  }

  test("bruteKnnTopKAgg returns exactly bruteKnn's rows") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 17) % 13).toFloat - 6f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 3)
    val c = emb.filter($"vec_id" >= 3)
    val viaAgg = Similarity.bruteKnnTopKAgg(q, c, k = 4)
      .orderBy("query_id", "rank").collect().map(_.toString)
    val viaWindow = Similarity.bruteKnn(q, c, k = 4)
      .orderBy("query_id", "rank").collect().map(_.toString)
    viaAgg shouldBe viaWindow
  }
}
