package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact bounded top-k as a custom `TypedImperativeAggregate`:
  * `graft_top_k(score, id, k)` keeps the k best (score desc, id asc)
  * pairs in a size-k heap and returns them best-first as
  * `array<struct<score double, id bigint>>`.
  *
  * Why a custom aggregate: the window form of exact kNN
  * (`row_number over (partition by query order by score)`) shuffles
  * EVERY scored (query, candidate) row to rank them — |corpus|×|queries|
  * rows through the exchange. This aggregate is partial-aggregation
  * friendly: each map task reduces its partition to a k-heap per group
  * before the shuffle, so the exchange carries partitions×groups×k rows
  * regardless of corpus size — the shape that survives a 100 TB corpus.
  * (`collect_list`+`slice` cannot do this: it materializes the whole
  * group before truncating.)
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    // dataType gate BEFORE eval(): a non-integral literal (e.g. 'x') must
    // fail analysis with a clean TypeCheckFailure, not a ClassCastException
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_top_k: k must be an INT literal")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k: score must be DOUBLE, got ${scoreExpr.dataType.catalogString}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k: id must be BIGINT, got ${idExpr.dataType.catalogString}")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("graft_top_k: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  /** Heap order: the WORST entry (lowest score, ties broken to the
    * larger id) is the maximum, so dequeue() evicts it in O(log k). */
  private val evictionOrder: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(evictionOrder)

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buffer.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buffer.enqueue(e)
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    // best-first: ascending under evictionOrder (best compares smallest)
    val sorted = buffer.toArray.sorted(evictionOrder)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { q.enqueue((in.readDouble(), in.readLong())); j += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKByScore {

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_top_k"),
    new ExpressionInfo(classOf[TopKByScore].getCanonicalName, "graft_top_k"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "graft_top_k takes (score, id, k)")
      TopKByScore(children(0), children(1), children(2))
    })
}
