package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Word n-grams over a token array in one pass — semantically identical
 * to the composed
 * `when(size(ts) < n, array(concat_ws(" ", ts)))
 *   .otherwise(transform(sequence(0, size(ts)-n), i => concat_ws(" ", slice(ts, i+1, n))))`
 * but native: higher-order functions are interpreted (no codegen), and
 * this expression feeds the explode at the head of every shingle-based
 * dedup (MinHash, SimHash, n-gram Jaccard). Null tokens are skipped
 * inside a shingle, matching concat_ws.
 */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires ARRAY<STRING>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
    { children =>
      require(children.size == 2, "graft_word_shingles(tokens, n) takes 2 arguments")
      val n = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_word_shingles: n must be a literal integer, got $other")
      }
      WordShingles(children.head, n)
    }
  )

  private val Space = UTF8String.fromString(" ")

  private def join(ts: Array[UTF8String], from: Int, len: Int): UTF8String =
    UTF8String.concatWs(Space,
      java.util.Arrays.copyOfRange(ts, from, from + len): _*)

  def shingles(arr: ArrayData, n: Int): GenericArrayData = {
    val m = arr.numElements()
    val ts = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ts(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (m < n) return new GenericArrayData(Array[Any](join(ts, 0, m)))
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      out(i) = join(ts, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
