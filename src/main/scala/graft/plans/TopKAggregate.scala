package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, InterpretedOrdering, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * `graft_topk(struct, k)` — bounded top-k aggregate: keeps the k LARGEST
 * struct values (lexicographic field order) in a size-k heap and returns
 * them as an array sorted descending. The `smallest = true` face is
 * registered as `graft_bottomk(struct, k)`: the k SMALLEST values,
 * returned ascending — the "earliest k by timestamp" shape the funnel
 * hot-user guard needs.
 *
 * This is the aggregate Spark's built-ins can't express: `collect_list`
 * buffers every row before the final sort/slice, and a `row_number`
 * window shuffles every input row to one task per partition key. A
 * TypedImperativeAggregate partial-aggregates map-side, so the shuffle
 * carries AT MOST k rows per group per input partition — the two-stage
 * top-k that makes ANN reductions scale (1000 executors × k rows,
 * not |corpus| rows, cross the wire).
 *
 * Rank-order composition is the caller's job: lexicographic max on
 * `struct(score, -id)` = "score desc, id asc".
 */
case class TopKAggregate(
    left: Expression,
    right: Expression,
    smallest: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with BinaryLike[Expression] {

  private lazy val structType: StructType = left.dataType.asInstanceOf[StructType]

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  /** Ordering under which the KEPT values are the k largest: plain
    * ascending lexicographic for top-k, reversed for bottom-k (the k
    * smallest are the k largest under the reverse order).
    */
  private lazy val ord: Ordering[InternalRow] = {
    val asc = InterpretedOrdering.forSchema(
      structType.fields.map(_.dataType).toIndexedSeq)
    if (smallest) asc.reverse else asc
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!left.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRUCT first argument, got ${left.dataType}")
    else if (!right.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(right.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal integer k")
    else if (right.eval() == null || right.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(left.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (smallest) "graft_bottomk" else "graft_topk"

  // heap head is the WEAKEST of the k kept values under `ord` — the eviction test
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(ord.reverse)

  private def insert(buf: mutable.PriorityQueue[InternalRow], v: InternalRow): Unit = {
    if (buf.size < k) buf += v
    else if (ord.compare(v, buf.head) > 0) { buf.dequeue(); buf += v }
  }

  override def update(
      buf: mutable.PriorityQueue[InternalRow], input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = left.eval(input)
    // copy: eval may return a reused row backed by the input buffer
    if (v != null) insert(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ord.reverse).asInstanceOf[Array[Any]])

  private lazy val serProj = UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray.asInstanceOf[Array[Any]])))
      .getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      buf += arr.getStruct(i, structType.size).copy()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TopKAggregate {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKAggregate].getName, "graft_topk"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_topk(struct, k) takes 2 arguments")
      TopKAggregate(children(0), children(1)).toAggregateExpression()
    }
  )

  val bottomKDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bottomk"),
    new ExpressionInfo(classOf[TopKAggregate].getName, "graft_bottomk"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_bottomk(struct, k) takes 2 arguments")
      TopKAggregate(children(0), children(1), smallest = true).toAggregateExpression()
    }
  )

  /** Imperative registration for an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    Seq(functionDescriptor, bottomKDescriptor).foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
  }

  /** k must be a foldable literal: `Literal(10)`. */
  def literal(k: Int): Expression = Literal(k, IntegerType)
}
