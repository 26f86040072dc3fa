package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.SparkSpec
import graft.functions.TextFunctions._

/** The native hashing kernels must emit exactly the values of the
  * composed forms they replaced — they feed LSH band keys and simhash
  * signatures, where a single changed bit changes candidate sets. */
class HashExprsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "a b c d e f g h", "single", "")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")
    .withColumn("toks", tokens(col("text")))

  test("graft_md5_longs equals conv(substring(md5(s), 1, n), 16, 10) for n = 4 and 15") {
    for (n <- Seq(4, 15)) {
      val bad = docs.select(
        (md5PrefixLongs(col("toks"), n) ===
          transform(col("toks"),
            t => conv(substring(md5(t), 1, n), 16, 10).cast(LongType))).as("ok"))
        .filter(!$"ok").count()
      withClue(s"nHex=$n: ") { bad shouldBe 0L }
    }
  }

  test("graft_simhash16 equals the 16 composed aggregate votes") {
    val hofSimhash = {
      val hashes = transform(col("toks"),
        t => conv(substring(md5(t), 1, 4), 16, 10).cast(IntegerType))
      (0 until 16).map { j =>
        val mask = 1 << j
        val votes = aggregate(hashes, lit(0),
          (acc, h) => acc + when((h.bitwiseAND(lit(mask))) > 0, 1).otherwise(-1))
        when(votes > 0, lit(mask)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val bad = docs
      .select((simhash16FromHashes(tokenHashes16(col("toks"))) === hofSimhash).as("ok"))
      .filter(!$"ok").count()
    bad shouldBe 0L
  }

  test("graft_shingle_md5_longs equals md5PrefixLongs over shinglesFromTokens") {
    for (n <- Seq(2, 3, 5)) {
      val bad = docs.select(
        (shingleMd5Longs(col("toks"), n, 15) ===
          md5PrefixLongs(shinglesFromTokens(col("toks"), n), 15)).as("ok"))
        .filter(!$"ok").count()
      withClue(s"n=$n: ") { bad shouldBe 0L }
    }
    // null tokens are skipped by concat_ws — reproduced in the fused join
    val withNull = Seq(Tuple1(Seq[String]("a", null, "b", "c"))).toDF("toks")
    val fused = withNull.select(shingleMd5Longs($"toks", 2, 15)).head().getSeq[Long](0)
    val composed = withNull
      .select(md5PrefixLongs(shinglesFromTokens($"toks", 2), 15)).head().getSeq[Long](0)
    fused shouldBe composed
  }

  test("graft_seeded_minhash equals the per-seed array_min/transform composition") {
    val shingled = docs.withColumn("sh", wordShingles(col("text"), 2))
      .filter(org.apache.spark.sql.functions.size(col("sh")) >= 1)
    val hofSig = array((0 until 6).map(seed => minhash(col("sh"), seed)): _*)
    val bad = shingled
      .select((minhashSignature(col("sh"), 6) === hofSig).as("ok"))
      .filter(!$"ok").count()
    bad shouldBe 0L
    // empty shingle set: every slot null, like array_min over empty
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(minhashSignature($"sh", 3).as("sig")).head().getSeq[Any](0)
    empty.forall(_ == null) shouldBe true
  }

  test("graft_hit_count equals size(filter(array_contains)) incl. null edges") {
    val words = EnglishStopwords
    val set = array(words.map(lit): _*)
    val bad = docs.select(
      (stopwordCountFromTokens(col("toks")) ===
        org.apache.spark.sql.functions.size(
          filter(col("toks"), t => array_contains(set, t)))).as("ok"))
      .filter(!$"ok").count()
    bad shouldBe 0L
    // null token doesn't count; null input array -> NULL
    val edge = Seq(
      (1L, Seq[String]("the", null, "fox")),
      (2L, null))
      .toDF("id", "toks")
      .select($"id", stopwordCountFromTokens($"toks").as("n")).orderBy("id").collect()
    edge(0).getInt(1) shouldBe 1
    edge(1).isNullAt(1) shouldBe true
  }

  test("null elements vote like h = 0 and a null input array yields 0") {
    val edge = Seq(
      (1L, Seq[java.lang.Long](0xffffL, null, 0xffffL)),
      (2L, Seq[java.lang.Long](0xffffL, 0L, 0xffffL)),
      (3L, null))
      .toDF("id", "hs")
    val r = edge.select($"id", simhash16FromHashes($"hs").as("sh")).orderBy("id").collect()
    r(0).getInt(1) shouldBe r(1).getInt(1) // null element == explicit 0
    r(2).getInt(1) shouldBe 0             // null array == composed-form 0
    // md5 kernel: null elements pass through as null slots
    val m = Seq((1L, Seq[String]("a", null, "b"))).toDF("id", "ss")
      .select(md5PrefixLongs($"ss", 4).as("h")).head().getSeq[Any](0)
    m.map(_ == null) shouldBe Seq(false, true, false)
  }
}
