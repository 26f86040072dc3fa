package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Distributed per-GROUP bloom-filter build:
  * `BloomBuildAgg(key, expectedItems, fpp)` aggregates each group's key
  * values into one serialized `org.apache.spark.util.sketch.BloomFilter`
  * (BINARY result).
  *
  * Why an aggregate: `DataFrameStatFunctions.bloomFilter` builds ONE
  * filter per job — building a filter per data file / partition leaf
  * that way costs a Spark job per leaf. This aggregate builds every
  * leaf's filter in a SINGLE `groupBy(leaf).agg(...)` pass, with
  * map-side partial aggregation (bloom buffers OR-merge), so sidecar
  * generation for a commit is one column-pruned job over the freshly
  * written files regardless of leaf count.
  *
  * Key normalization (must match [[graft.store.BloomSkipping]]'s probe
  * side exactly): integral values are widened to long (`putLong`),
  * strings hash their UTF-8 bytes (`putBinary`). Nulls are skipped —
  * an equality probe can never select a null. Non-integral/non-string
  * types are rejected at analysis.
  */
case class BloomBuildAgg(
    keyExpr: Expression,
    itemsExpr: Expression,
    fppExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(keyExpr, itemsExpr, fppExpr)

  private lazy val expectedItems: Long =
    itemsExpr.eval().asInstanceOf[Number].longValue()
  private lazy val fpp: Double =
    fppExpr.eval().asInstanceOf[Number].doubleValue()

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!itemsExpr.foldable || !integral(itemsExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_build: expectedItems must be an integral literal")
    else if (!fppExpr.foldable || fppExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_build: fpp must be a DOUBLE literal")
    else keyExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType | _: StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_build: unsupported key type ${other.catalogString}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(1L, expectedItems), fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = keyExpr.eval(input)
    if (v != null) v match {
      case n: Byte => buffer.putLong(n.toLong)
      case n: Short => buffer.putLong(n.toLong)
      case n: Int => buffer.putLong(n.toLong)
      case n: Long => buffer.putLong(n)
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case other => throw new IllegalStateException(
        s"graft_bloom_build: unexpected value $other")
    }
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(keyExpr = newChildren(0), itemsExpr = newChildren(1), fppExpr = newChildren(2))
}

object BloomBuildAgg {

  /** FunctionDescription for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_build"),
    new ExpressionInfo(classOf[BloomBuildAgg].getCanonicalName, "graft_bloom_build"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "graft_bloom_build takes (key, expectedItems, fpp)")
      BloomBuildAgg(children(0), children(1), children(2))
    })

  /** DataFrame-API aggregate column (function registered by
    * graft.plans.GraftExtensions). */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column =
    call_function("graft_bloom_build", key, lit(expectedItems), lit(fpp))
}
