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
 * `graft_elemmax(array<tinyint>)` — element-wise max over fixed-length
 * byte arrays: the HyperLogLog REGISTER MERGE as a first-class
 * aggregate. A register bank is an m-byte array (one ρ per bucket);
 * merging two banks is per-slot max, and that operation is what
 * HyperBall-style neighborhood propagation does once per node per
 * round.
 *
 * Why native: Spark's built-ins can only express this as
 * `collect_list` + a `zip_with(greatest)` fold (buffers every input
 * array per group, no partial aggregation) or by EXPLODING each array
 * to (slot, value) rows and `max`-ing per (group, slot) — m rows per
 * input row through the shuffle, which at m = 64 is a ~10× byte
 * blow-up against carrying the bank whole. A TypedImperativeAggregate
 * folds banks into one m-byte buffer map-side, so the shuffle carries
 * exactly one bank per group per input partition, independent of
 * group fan-in.
 *
 * Mismatched lengths are a hard error (banks from different m never
 * merge silently); null inputs are skipped; an all-null group yields
 * null.
 */
case class ElemMaxAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<TINYINT>, got $other")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_elemmax"

  // length-0 sentinel = "no input seen yet" (real banks are never empty)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(buf: Array[Byte], v: Array[Byte]): Array[Byte] = {
    if (buf.isEmpty) return v
    require(buf.length == v.length,
      s"graft_elemmax: register banks of different lengths " +
        s"(${buf.length} vs ${v.length}) — inputs built with different m")
    var i = 0
    while (i < buf.length) {
      if (v(i) > buf(i)) buf(i) = v(i)
      i += 1
    }
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      // toByteArray silently reads a null slot as ρ=0 — a corrupted bank
      // must be a hard error, not a quiet undercount
      var i = 0
      while (i < arr.numElements()) {
        require(!arr.isNullAt(i),
          s"graft_elemmax: register bank has a null slot at index $i — " +
            "banks are fixed-width byte arrays with no null elements")
        i += 1
      }
      maxInto(buf, arr.toByteArray())
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf else maxInto(buf, other)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): ElemMaxAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElemMaxAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ElemMaxAggregate {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_elemmax"),
    new ExpressionInfo(classOf[ElemMaxAggregate].getName, "graft_elemmax"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_elemmax(array<tinyint>) takes 1 argument")
      ElemMaxAggregate(children.head).toAggregateExpression()
    }
  )

  /** Imperative registration for an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = functionDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
