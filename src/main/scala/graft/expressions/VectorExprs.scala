package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native dense-vector kernels for the ANN/dedup paths.
  *
  * Why native: Spark's higher-order functions (`aggregate`, `zip_with`,
  * `transform`) are CodegenFallback — every element runs an interpreted
  * lambda with boxed accumulators, and a cosine written as HOFs walks the
  * vector three times (dot, |a|, |b|). These expressions fuse the walk
  * into one codegen'd loop over the unsafe array data.
  *
  * BIT-FOR-BIT parity with the HOF forms they replace (and with the
  * DuckDB oracle's list functions): each accumulator adds the same
  * products in the same left-to-right element order, floats widen to
  * double before multiplying, a length mismatch or null element yields
  * NULL exactly like null-propagating lambda arithmetic. Swapping the
  * implementation changes no query result, only the plan.
  */
private[expressions] trait VectorElementAccess {

  protected def vectorType(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  protected def elemGet(a: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Java accessor snippet for codegen, widened to double. */
  protected def elemCode(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** `graft_dot(a, b)` — Σ aᵢ·bᵢ as one fused pass. NULL on length
  * mismatch or any null element (HOF null-propagation semantics). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with VectorElementAccess {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vectorType(left.dataType) || !vectorType(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += elemGet(a, i, leftElem) * elemGet(b, i, rightElem)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $l.numElements();
         |boolean $bad = $n != $r.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
         |  $dot += ${elemCode(l, i, leftElem)} * ${elemCode(r, i, rightElem)};
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot takes (a, b)")
      DotProduct(children(0), children(1))
    })
}

/** `graft_cosine(a, b)` — Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), all three sums in ONE
  * pass. Identical accumulation order to `dot(a,b)/(norm2(a)*norm2(b))`
  * composed from HOFs, so results are bit-for-bit unchanged. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with VectorElementAccess {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vectorType(left.dataType) || !vectorType(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemGet(a, i, leftElem)
      val y = elemGet(b, i, rightElem)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $l.numElements();
         |boolean $bad = $n != $r.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
         |  double $x = ${elemCode(l, i, leftElem)};
         |  double $y = ${elemCode(r, i, rightElem)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSim].getCanonicalName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_cosine takes (a, b)")
      CosineSim(children(0), children(1))
    })
}

/** `graft_lsh_bucket(v, planes, firstPlane)` — the random-hyperplane
  * bucket string ('1'/'0' sign bit per plane) in ONE pass over the
  * vector, vs one interpreted HOF aggregate PER PLANE in the composed
  * form. The hyperplane components are the same pure integer modular
  * formula (`VectorFunctions.hyperplaneComponent`), evaluated in the
  * same per-plane element order, so bucket keys are unchanged.
  *
  * Parity edge: a null element (or an empty vector) poisons every
  * plane's projection in the HOF form (`null >= 0` falls to the
  * otherwise-branch), yielding the all-'0' bucket — reproduced here. */
case class LshBucket(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with VectorElementAccess {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vectorType(first.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bucket requires ARRAY<FLOAT|DOUBLE>, got ${first.dataType.catalogString}")
    else if (!second.foldable || second.dataType != IntegerType ||
      !third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "graft_lsh_bucket: planes and firstPlane must be INT literals")
    else if (second.eval() == null || third.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "graft_lsh_bucket: planes and firstPlane must not be NULL")
    else {
      val p = second.eval().asInstanceOf[Number].intValue()
      if (p < 1 || p > 64)
        TypeCheckResult.TypeCheckFailure(s"graft_lsh_bucket: planes must be in [1, 64], got $p")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lsh_bucket"

  private lazy val planes: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val firstPlane: Int = third.eval().asInstanceOf[Number].intValue()
  private lazy val elemType = first.dataType.asInstanceOf[ArrayType].elementType

  protected override def nullSafeEval(v: Any, p: Any, f: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = a.numElements()
    val sums = new Array[Double](planes)
    var poisoned = m == 0
    var i = 0
    while (i < m && !poisoned) {
      if (a.isNullAt(i)) poisoned = true
      else {
        val x = elemGet(a, i, elemType)
        var s = 0
        while (s < planes) {
          val h = ((firstPlane + s).toLong * 131071L + i.toLong * 524287L) *
            2654435761L % 1000003L
          sums(s) += x * (h.toDouble / 1000003.0 * 2.0 - 1.0)
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](planes)
    var s = 0
    while (s < planes) {
      out(s) = if (!poisoned && sums(s) >= 0) '1' else '0'
      s += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val sums = ctx.freshName("sums")
      val poisoned = ctx.freshName("poisoned")
      val out = ctx.freshName("out")
      s"""
         |int $m = $v.numElements();
         |double[] $sums = new double[$planes];
         |boolean $poisoned = ($m == 0);
         |for (int $i = 0; $i < $m && !$poisoned; $i++) {
         |  if ($v.isNullAt($i)) { $poisoned = true; break; }
         |  double $x = ${elemCode(v, i, elemType)};
         |  for (int $s = 0; $s < $planes; $s++) {
         |    long $h = ((long)($firstPlane + $s) * 131071L + (long)$i * 524287L)
         |      * 2654435761L % 1000003L;
         |    $sums[$s] += $x * ((double) $h / 1000003.0 * 2.0 - 1.0);
         |  }
         |}
         |byte[] $out = new byte[$planes];
         |for (int $s = 0; $s < $planes; $s++) {
         |  $out[$s] = (byte) ((!$poisoned && $sums[$s] >= 0) ? '1' : '0');
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBucket =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBucket {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lsh_bucket"),
    new ExpressionInfo(classOf[LshBucket].getCanonicalName, "graft_lsh_bucket"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "graft_lsh_bucket takes (v, planes, firstPlane)")
      LshBucket(children(0), children(1), children(2))
    })
}
