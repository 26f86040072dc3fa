package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bloom pre-prune must be SOUND (no false negatives — every true
  * key passes) and must actually prune (false-positive rate near the
  * configured fpp, not 100%); and the expression must run under
  * CODEGEN_ONLY like every other native kernel. */
class BloomMightContainSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives; false positives near the configured fpp") {
    val keys = (1L to 1000L).toDF("k")
    val bytes = BloomMightContain.buildFilterBytes(keys, "k", 1000L, fpp = 0.01)

    // every true key passes — pruning with this filter is sound
    keys.filter(BloomMightContain.mightContain(col("k"), bytes))
      .count() shouldBe 1000L

    // of 10k known-absent keys, roughly fpp survive (loose bound: the
    // observed rate must be well under 5x the configured 1%)
    val absent = (100001L to 110000L).toDF("k")
    val fp = absent.filter(BloomMightContain.mightContain(col("k"), bytes))
      .count()
    fp.toDouble / 10000 should be < 0.05
  }

  test("null keys propagate null (filtered out), and codegen-only runs") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val keys = Seq(1L, 2L, 3L).toDF("k")
      val bytes = BloomMightContain.buildFilterBytes(keys, "k", 3L)
      val df = Seq(Some(1L), None, Some(99L)).toDF("k")
      df.filter(BloomMightContain.mightContain(col("k"), bytes))
        .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("the semi join after the bloom settles false positives exactly") {
    val dim = (1L to 100L).filter(_ % 7 == 0).toDF("k")
    val bytes = BloomMightContain.buildFilterBytes(dim, "k", 20L)
    val fact = (1L to 100L).toDF("k")
    val out = fact
      .filter(BloomMightContain.mightContain(col("k"), bytes))
      .join(broadcast(dim), Seq("k"), "left_semi")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    out shouldBe (1L to 100L).filter(_ % 7 == 0)
  }
}
