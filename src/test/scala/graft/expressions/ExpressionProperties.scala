package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the custom Catalyst expressions — pure
  * buffer/eval algebra, no SparkSession, so hundreds of cases run in
  * milliseconds. (The DataFrame-level behavior is covered by the
  * RollingHashSpec / TopKByScoreSpec ScalaTest suites.) */
object ExpressionProperties extends Properties("graft.expressions") {

  // ---- RollingHash ----------------------------------------------------

  private def refHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31L + (b & 0xff)) & 0x7fffffffL)

  property("rollingHash matches the reference byte fold") = forAll { (s: String) =>
    RollingHash(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
      .eval() == refHash(s)
  }

  property("rollingHash range is [0, 2^31)") = forAll { (s: String) =>
    val h = RollingHash(Literal(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)).eval().asInstanceOf[Long]
    h >= 0L && h < 0x80000000L
  }

  // ---- TopKByScore buffer algebra ------------------------------------

  private def mkAgg(k: Int) = TopKByScore(
    BoundReference(0, DoubleType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    Literal(k))

  private def evalPairs(agg: TopKByScore,
      buf: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
    agg.eval(buf).asInstanceOf[GenericArrayData].array.toSeq
      .map(_.asInstanceOf[InternalRow])
      .map(r => (r.getDouble(0), r.getLong(1)))

  private def fill(agg: TopKByScore, xs: Seq[(Double, Long)]) = {
    val b = agg.createAggregationBuffer()
    xs.foreach { case (s, i) => agg.update(b, InternalRow(s, i)) }
    b
  }

  private val pairGen: Gen[(Double, Long)] =
    Gen.zip(Gen.choose(-1.0, 1.0), Gen.choose(-1000L, 1000L))
  private val inputGen: Gen[List[(Double, Long)]] = Gen.listOf(pairGen)
  private val kGen: Gen[Int] = Gen.choose(1, 10)

  property("top-k equals sort-desc-take-k") = forAll(inputGen, kGen) { (xs, k) =>
    val agg = mkAgg(k)
    evalPairs(agg, fill(agg, xs)) ==
      xs.sortBy { case (s, i) => (-s, i) }.take(k)
  }

  property("merge of any split equals single-buffer result") =
    forAll(inputGen, kGen, Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = mkAgg(k)
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      val merged = agg.merge(fill(agg, l), fill(agg, r))
      evalPairs(agg, merged) == evalPairs(agg, fill(agg, xs))
    }

  property("serialize/deserialize round-trips the buffer") =
    forAll(inputGen, kGen) { (xs, k) =>
      val agg = mkAgg(k)
      val b = fill(agg, xs)
      evalPairs(agg, agg.deserialize(agg.serialize(b))) == evalPairs(agg, b)
    }

  property("buffer never exceeds k entries") = forAll(inputGen, kGen) { (xs, k) =>
    val agg = mkAgg(k)
    fill(agg, xs).size <= k
  }

  // ---- NgramHashes / MinhashSketch ------------------------------------

  private def ngramCodes(s: String, n: Int): Seq[Long] =
    NgramHashes(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType),
      Literal(n)).eval().asInstanceOf[GenericArrayData].toLongArray().toSeq

  private val asciiGen: Gen[String] = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
  private val nGen: Gen[Int] = Gen.choose(1, 7)

  property("ngram codes: one per byte window, injective vs the substrings") =
    forAll(asciiGen, nGen) { (s, n) =>
      val codes = ngramCodes(s, n)
      val grams = if (s.length < n) Seq.empty else s.sliding(n).toSeq
      codes.length == math.max(0, s.length - n + 1) &&
        codes.distinct.length == grams.distinct.length
    }

  property("ngram codes equal the base-257 byte fold") =
    forAll(asciiGen, nGen) { (s, n) =>
      val bytes = s.getBytes("UTF-8")
      val expected = (0 to bytes.length - n).map { i =>
        (0 until n).foldLeft(0L)((h, j) => h * 257L + (bytes(i + j) & 0xff))
      }
      ngramCodes(s, n) == expected
    }

  property("minhash sketch equals per-seed affine minima") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1L << 60)), kGen) { (hs, k) =>
      val P = 2147483647L
      val arr = MinhashSketch(
        Literal.create(hs, ArrayType(LongType)), Literal(k))
        .eval().asInstanceOf[GenericArrayData].toLongArray().toSeq
      val expected = (0 until k).map(i =>
        hs.map(h => ((h % P) * (2 * i + 1) + i * 40503L) % P).min)
      arr == expected
    }

  property("minhash sketch floorMods negative inputs and stays in [0, P)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue + 1, Long.MaxValue)), kGen) {
      (hs, k) =>
        val P = 2147483647L
        val arr = MinhashSketch(
          Literal.create(hs, ArrayType(LongType)), Literal(k))
          .eval().asInstanceOf[GenericArrayData].toLongArray().toSeq
        val expected = (0 until k).map(i =>
          hs.map(h => (Math.floorMod(h, P) * (2 * i + 1) + i * 40503L) % P).min)
        arr == expected && arr.forall(v => v >= 0 && v < P)
    }

  property("minhash sketch skips null slots; all-null input yields empty") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1L << 60)), kGen) { (hs, k) =>
      val nullable = ArrayType(LongType, containsNull = true)
      val interleaved: Seq[Any] = hs.flatMap(h => Seq[Any](h, null))
      val sparse = MinhashSketch(Literal.create(interleaved, nullable), Literal(k))
        .eval().asInstanceOf[GenericArrayData].toLongArray().toSeq
      val dense = MinhashSketch(Literal.create(hs, ArrayType(LongType)), Literal(k))
        .eval().asInstanceOf[GenericArrayData].toLongArray().toSeq
      val allNull = MinhashSketch(
        Literal.create(Seq[Any](null, null), nullable), Literal(k))
        .eval().asInstanceOf[GenericArrayData].numElements()
      sparse == dense && allNull == 0
    }
}
