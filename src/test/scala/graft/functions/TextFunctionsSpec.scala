package graft.functions

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  import TextFunctions._
  import spark.implicits._

  private def onText[T](text: String)(c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("tokens and normalization edge cases") {
    onText("  a   b\tc  ")(functions.size(tokens(col("t")))) shouldBe 3
    onText("Hello   WORLD")(normalize(col("t"))) shouldBe "hello world"
    onText("It's 50%—off!")(normalizeAggressive(col("t"))) shouldBe "it s 50 off"
  }

  test("wordShingles: fewer tokens than n yields empty, exact n yields one") {
    onText("a b")(functions.size(wordShingles(col("t"), 3))) shouldBe 0
    onText("a b c")(wordShingles(col("t"), 3)) shouldBe Seq("a b c")
    onText("a b c d")(wordShingles(col("t"), 2)) shouldBe Seq("a b", "b c", "c d")
  }

  test("minhash signature width and band keys for non-default shapes") {
    val sig = onText("a b c d e f")(
      minhashSignature(wordShingles(col("t"), 2), 6)).asInstanceOf[scala.collection.Seq[String]]
    sig.length shouldBe 6
    sig.foreach(_.length shouldBe 16)
    // 3 bands × 2 rows over a 6-wide signature
    val bands = onText("a b c d e f")(
      lshBands(minhashSignature(wordShingles(col("t"), 2), 6), 3, 2))
      .asInstanceOf[scala.collection.Seq[String]]
    bands.length shouldBe 3
    bands.zipWithIndex.foreach { case (b, i) => b should startWith(s"${i}_") }
    // identical docs share every band; a different doc differs
    val bands2 = onText("a b c d e f g")(
      lshBands(minhashSignature(wordShingles(col("t"), 2), 6), 3, 2))
      .asInstanceOf[scala.collection.Seq[String]]
    bands2 should not be bands
  }

  test("simhash16 within range and hamming distance behaves") {
    val sh = onText("the quick brown fox")(simhash16(col("t"))).asInstanceOf[Int]
    sh should (be >= 0 and be <= 0xFFFF)
    val df = Seq((5, 7)).toDF("a", "b")
    df.select(hamming16(col("a"), col("b"))).head().getInt(0) shouldBe 1
    df.select(hamming16(col("a"), col("a"))).head().getInt(0) shouldBe 0
  }

  test("qualityScore bounds and langId branches") {
    val q = onText("the cat sat on the mat for a while today")(
      qualityScore(col("t"))).asInstanceOf[Double]
    q should (be >= 0.0 and be <= 1.0)
    onText("el perro de la casa que ladra en los dias")(langId(col("t"))) shouldBe "es"
    onText("the dog of the house")(langId(col("t"))) shouldBe "en"
    onText("你好世界")(langId(col("t"))) shouldBe "zh"
    onText("xyzzy")(langId(col("t"))) shouldBe "en" // tie → en
  }

  test("jaccardTokens exact values") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
    df.select(jaccardTokens(col("x"), col("y"))).head().getDouble(0) shouldBe 0.5
    val same = Seq(("a b", "b a")).toDF("x", "y")
    same.select(jaccardTokens(col("x"), col("y"))).head().getDouble(0) shouldBe 1.0
  }

  test("vector primitives: dot, norm, cosine, l2 on known vectors") {
    import VectorFunctions._
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    df.select(dot(col("a"), col("b"))).head().getDouble(0) shouldBe 0.0
    df.select(cosine(col("a"), col("a"))).head().getDouble(0) shouldBe 1.0
    df.select(l2Distance(col("a"), col("b"))).head().getDouble(0) shouldBe
      math.sqrt(2.0) +- 1e-12
    df.select(norm2(col("a"))).head().getDouble(0) shouldBe 1.0
  }

  test("lshBucket is deterministic and plane-count wide") {
    import VectorFunctions._
    val df = Seq(Tuple1(Seq.fill(8)(0.5f))).toDF("v")
    val b1 = df.select(lshBucket(col("v"), 6)).head().getString(0)
    val b2 = df.select(lshBucket(col("v"), 6)).head().getString(0)
    b1 shouldBe b2
    b1.length shouldBe 6
    b1 should fullyMatch regex "[01]{6}"
  }

  test("bpeTokens splits contractions, numbers and punctuation runs") {
    val df = Seq("I've got 12 cats, don't I?").toDF("t")
    df.select(bpeTokens(col("t"))).head().getSeq[String](0) shouldBe
      Seq("I", "'ve", " got", " 12", " cats", ",", " don", "'t", " I", "?")
    // BPE-ish count >= whitespace count on punctuation-bearing text
    df.select(bpeTokenCount(col("t"))).head().getInt(0) shouldBe 10
    df.select(tokenCount(col("t"))).head().getInt(0) shouldBe 6
  }
}
