package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `graft_elemsum(array<bigint>)` — element-wise SUM over fixed-length
 * long arrays: the gradient-accumulation merge of the embedding
 * trainer ([[graft.operators.Graph.sgnsEpochs]]) as a first-class
 * aggregate. A per-pair delta is a d-long array; a node's epoch update
 * is the element-wise sum of every delta that touches it.
 *
 * Why native (the [[ElemMaxAggregate]] argument, sum-shaped): the
 * built-in route is EXPLODING each array to (slot, value) rows and
 * summing per (group, slot) — d rows per input row through the
 * shuffle. A TypedImperativeAggregate folds deltas into one d-long
 * buffer map-side, so the shuffle carries exactly one array per group
 * per input partition, independent of how many pairs touch a node —
 * the difference between a hub node costing deg(hub)·d shuffled rows
 * and costing d·partitions longs.
 *
 * Mismatched lengths are a hard error (deltas from different d never
 * merge silently); a null array input is skipped; a null SLOT is a
 * hard error (a torn delta must not read as 0); element sums overflow
 * to a hard error via addExact, never wrap.
 */
case class ElemSumAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_elemsum"

  // length-0 sentinel = "no input seen yet" (real deltas are never empty)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], v: Array[Long]): Array[Long] = {
    if (buf.isEmpty) return v
    require(buf.length == v.length,
      s"graft_elemsum: arrays of different lengths " +
        s"(${buf.length} vs ${v.length}) — inputs built with different d")
    var i = 0
    while (i < buf.length) {
      buf(i) = Math.addExact(buf(i), v(i))
      i += 1
    }
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        require(!arr.isNullAt(i),
          s"graft_elemsum: array has a null slot at index $i — deltas are " +
            "fixed-width long arrays with no null elements")
        i += 1
      }
      addInto(buf, arr.toLongArray())
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf else addInto(buf, other)

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ElemSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElemSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ElemSumAggregate {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_elemsum"),
    new ExpressionInfo(classOf[ElemSumAggregate].getName, "graft_elemsum"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_elemsum(array<bigint>) takes 1 argument")
      ElemSumAggregate(children.head).toAggregateExpression()
    }
  )

  /** Imperative registration for an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = functionDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
