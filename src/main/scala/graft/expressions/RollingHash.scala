package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h = (h * 31 + byte) mod 2^31`, left to right — the classic
  * content-defined fingerprint primitive (cheap, incremental, no crypto
  * cost), as a NATIVE Catalyst expression.
  *
  * Why an Expression and not built-ins: the composable form
  * (`aggregate(transform(split(text, ""), ascii), ...)`) materializes a
  * per-character array and runs an interpreted lambda per element —
  * O(chars) object churn per row and a codegen break in the hot path.
  * This version is a single fused loop over the row's bytes inside
  * whole-stage codegen (`doGenCode`), with an identical interpreted
  * `nullSafeEval` for non-codegen paths.
  *
  * Registered as SQL function `graft_rolling_hash` via
  * `graft.plans.GraftExtensions` (SparkSessionExtensions.injectFunction);
  * reachable from the DataFrame API through
  * `TextFunctions.rollingHash` (`call_function`).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  // ExpectsInputTypes is off-limits outside org.apache.spark.sql
  // (AbstractDataType is private[sql] in Spark 4), so check explicitly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // mask == mod 2^31 for non-negative h; h*31+255 < 2^36, no overflow
      h = (h * 31L + (bytes(i) & 0xff)) & 0x7fffffffL
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} = (${ev.value} * 31L + ($bytes[$i] & 0xff)) & 0x7fffffffL;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  /** FunctionDescription for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getCanonicalName, "graft_rolling_hash"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_rolling_hash takes exactly one argument")
      RollingHash(children.head)
    })
}
