package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Every native kernel must actually CODEGEN — Spark silently falls
  * back to interpreted eval when generated Java fails to compile, which
  * keeps results correct but erases the perf claim. Forcing
  * CODEGEN_ONLY turns any such fallback into a hard error. */
class CodegenOnlySpec extends SparkSpec {

  import spark.implicits._

  private def codegenOnly[A](body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("all custom expressions execute under CODEGEN_ONLY") {
    codegenOnly {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog", Seq(0.5f, -0.25f, 1.0f)),
        (2L, "pack my box with five dozen liquor jugs", Seq(-1.0f, 0.75f, 0.3f)))
        .toDF("id", "text", "vec")
        .withColumn("toks", tokens(col("text")))
      val out = docs.select(
        rollingHash(col("text")).as("rh"),
        charNgramCodes(col("text"), 4).as("ng"),
        minhashSketch(charNgramCodes(col("text"), 4), 4).as("sk"),
        md5PrefixLongs(col("toks"), 15).as("ml"),
        shingleMd5Longs(col("toks"), 3, 15).as("sml"),
        simhash16FromHashes(tokenHashes16(col("toks"))).as("sh"),
        minhashSignature(wordShingles(col("text"), 2), 4).as("sig"),
        stopwordCountFromTokens(col("toks")).as("hits"),
        dot(col("vec"), col("vec")).as("d"),
        cosine(col("vec"), col("vec")).as("c"),
        lshBucketFrom(col("vec"), 4, 0).as("bk"))
        .collect()
      out.length shouldBe 2
      out.foreach { r =>
        r.getAs[Double]("c") shouldBe 1.0 +- 1e-9 // cos(v, v)
        r.getAs[String]("bk").length shouldBe 4
      }
      // graft_top_k (TypedImperativeAggregate) under codegen-only too
      val top = docs.select(explode(col("toks")).as("t"))
        .select(org.apache.spark.sql.functions.length(col("t")).cast("double").as("s"),
          monotonically_increasing_id().as("i"))
        .agg(topKByScore(col("s"), col("i"), 3).as("top"))
        .head().getSeq[Any](0)
      top.length shouldBe 3
    }
  }
}
