package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_ngram_hashes(str, n)` — all length-n byte windows of a string
  * as base-257 codes: `code = Σ byte_j · 257^(n-1-j)`, one `array<long>`
  * per row. 257 > 255 makes the code INJECTIVE for fixed n, so set
  * operations over the codes are EXACT n-gram set operations — no md5,
  * no collision caveat.
  *
  * Why native: the composable form (transform(sequence(...), i →
  * substr(...)) then a hash per gram) materializes a string per window
  * and runs interpreted lambdas — ~10× more windows than word shingles
  * makes that the dominant cost of char-level dedup (measured 76 s on
  * the sf0.1 bench vs ~3 s for this fused byte loop). n ≤ 7 keeps the
  * code inside a Long. */
case class NgramHashes(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_hashes requires STRING, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_ngram_hashes: n must be an INT literal")
    else if (right.eval() == null)
      TypeCheckResult.TypeCheckFailure("graft_ngram_hashes: n must not be NULL")
    else {
      val n = right.eval().asInstanceOf[Number].intValue()
      if (n < 1 || n > 7)
        TypeCheckResult.TypeCheckFailure(s"graft_ngram_hashes: n must be in [1, 7], got $n")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  private lazy val n: Int = right.eval().asInstanceOf[Number].intValue()

  protected override def nullSafeEval(str: Any, nv: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val count = bytes.length - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](count)
      var i = 0
      while (i < count) {
        var h = 0L
        var j = 0
        while (j < n) { h = h * 257L + (bytes(i + j) & 0xff); j += 1 }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, _) => {
      val bytes = ctx.freshName("bytes")
      val count = ctx.freshName("count")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $count = $bytes.length - $n + 1;
         |long[] $out = new long[$count > 0 ? $count : 0];
         |for (int $i = 0; $i < $count; $i++) {
         |  long $h = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $h = $h * 257L + ($bytes[$i + $j] & 0xff);
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramHashes =
    copy(left = newLeft, right = newRight)
}

object NgramHashes {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_ngram_hashes"),
    new ExpressionInfo(classOf[NgramHashes].getCanonicalName, "graft_ngram_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_ngram_hashes takes (str, n)")
      NgramHashes(children(0), children(1))
    })
}

/** `graft_minhash_sketch(hashes, k)` — k-wide minhash signature of a
  * long-array in ONE fused pass: `sig_i = min over h of
  * ((h mod P)·(2i+1) + i·40503) mod P`, P = 2^31−1. The affine family
  * over an already-uniform code replaces k independent cryptographic
  * hashes (the standard production minhash layout); a native loop keeps
  * the per-element work in registers instead of k interpreted lambda
  * passes. Empty input → empty signature (callers filter empties). */
case class MinhashSketch(left: Expression, right: Expression) extends BinaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(LongType, _) =>
        if (!right.foldable || right.dataType != IntegerType)
          TypeCheckResult.TypeCheckFailure("graft_minhash_sketch: k must be an INT literal")
        else if (right.eval() == null ||
          right.eval().asInstanceOf[Number].intValue() < 1)
          TypeCheckResult.TypeCheckFailure("graft_minhash_sketch: k must be >= 1")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sketch requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sketch"

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  // floorMod, not %: Java % of a negative BIGINT is negative, which
  // would push the affine family outside [0, P) and degenerate band
  // keys. Null elements (the declared element type allows them — e.g.
  // transform() outputs containsNull arrays) are skipped; identical to %
  // and to dense arrays for the non-negative no-null inputs the dedup
  // pipelines feed, so existing signatures are unchanged.
  protected override def nullSafeEval(arr: Any, kv: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val m = a.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        seen = true
        val hm = Math.floorMod(a.getLong(i), P)
        var s = 0
        while (s < k) {
          val v = (hm * (2 * s + 1) + s * 40503L) % P
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(Array.empty[Long]) else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val m = ctx.freshName("m")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
         |int $m = $arr.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $seen = true;
         |    long $hm = java.lang.Math.floorMod($arr.getLong($i), ${P}L);
         |    for (int $s = 0; $s < $k; $s++) {
         |      long $v = ($hm * (2L * $s + 1L) + $s * 40503L) % ${P}L;
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $seen ? $mins : new long[0]);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSketch =
    copy(left = newLeft, right = newRight)
}

object MinhashSketch {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_sketch"),
    new ExpressionInfo(classOf[MinhashSketch].getCanonicalName, "graft_minhash_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_minhash_sketch takes (hashes, k)")
      MinhashSketch(children(0), children(1))
    })
}
