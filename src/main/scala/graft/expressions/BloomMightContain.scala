package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a LONG key — the map-side
  * pre-prune for a semi join whose build side is too big to broadcast
  * as data but tiny as a SKETCH: build a bloom over the build-side keys
  * (KBs–MBs for millions of keys), prune the probe scan BEFORE its
  * shuffle, then let the exact semi join settle the false positives.
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~matching fraction — Spark's own runtime
  * row-level filtering does exactly this, but only when the optimizer
  * volunteers; this expression makes the plan explicit and testable.
  *
  * Shape: `graft_bloom_might_contain(key, filterBytes)` where
  * `filterBytes` is a FOLDABLE binary literal (the serialized
  * `org.apache.spark.util.sketch.BloomFilter`). The filter deserializes
  * once per plan (lazy, then carried into codegen as a reference
  * object, not re-parsed per row). No false negatives — pruning is
  * sound; false positives at the configured fpp cost only wasted probe
  * rows, never wrong results.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain requires a BIGINT key, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[BinaryType] || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_might_contain requires a foldable BINARY serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval()
    require(bytes != null, "graft_bloom_might_contain: filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  protected override def nullSafeEval(value: Any, filter: Any): Any =
    bloom.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $bloomRef.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  /** FunctionDescription for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getCanonicalName,
      "graft_bloom_might_contain"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_bloom_might_contain takes exactly two arguments")
      BloomMightContain(children(0), children(1))
    })

  /** Distributed build + driver-side serialize of the build-side key
    * filter (`DataFrameStatFunctions.bloomFilter` runs an aggregate
    * job; the returned sketch is KB/MB-sized — metadata, not data). */
  def buildFilterBytes(
      keys: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = keys.stat.bloomFilter(keyCol, math.max(1L, expectedItems), fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** DataFrame-API door to the SQL-registered function. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    call_function("graft_bloom_might_contain", key, lit(filterBytes))
}
