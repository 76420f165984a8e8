package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character n-grams of a string in ONE byte walk — semantically
 * identical to the composed
 * `when(length(s) <= n, array(s))
 *   .otherwise(transform(sequence(1, length(s)-n+1), i => substr(s, i, n)))`
 * but linear: the HOF chain is interpreted AND `substr` on UTF8String
 * is char-indexed, so each of the O(len) lambda calls re-scans from
 * the string head — O(len²) per row on the composed form (measured as
 * the most expensive text gate). Here the char start offsets are
 * computed once and each shingle is a zero-copy byte-range view into
 * the input's backing array.
 */
case class CharShingles(child: Expression, n: Int, stride: Int = 1)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")
  require(stride > 0, "stride must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_shingles requires STRING, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharShingles.shingles(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharShingles.shingles($c, $n, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_char_shingles"),
    new ExpressionInfo(classOf[CharShingles].getName, "graft_char_shingles"),
    { children =>
      require(children.size == 2 || children.size == 3,
        "graft_char_shingles(s, n[, stride]) takes 2 or 3 arguments")
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_char_shingles: $what must be a literal integer, got $other")
      }
      val n = intLit(children(1), "n")
      val stride = if (children.size == 3) intLit(children(2), "stride") else 1
      CharShingles(children.head, n, stride)
    }
  )

  /** Every `stride`-th window emitted DIRECTLY — the strided caller
    * previously exploded all m−n+1 windows and filtered `pos % stride
    * == 0`, materializing ~stride× wasted window strings per char
    * (round-7 verdict #7). Result is identical to that filter by
    * construction: window i here starts at char i·stride.
    */
  def shingles(s: UTF8String, n: Int, stride: Int = 1): GenericArrayData = {
    val bytes = s.getBytes // materializes once; offsets below index into it
    val nb = bytes.length
    // char start offsets (one pass over the bytes)
    val offs = new Array[Int](s.numChars() + 1)
    var m = 0
    var b = 0
    while (b < nb) {
      offs(m) = b
      m += 1
      b += UTF8String.numBytesForFirstByte(bytes(b))
    }
    offs(m) = nb
    if (m <= n) return new GenericArrayData(Array[Any](s))
    val out = new Array[Any]((m - n) / stride + 1)
    var i = 0
    var p = 0
    while (p <= m - n) {
      out(i) = UTF8String.fromBytes(bytes, offs(p), offs(p + n) - offs(p))
      i += 1
      p += stride
    }
    new GenericArrayData(out)
  }
}
