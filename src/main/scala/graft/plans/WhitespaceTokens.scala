package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Whitespace tokenization as one byte scan — semantically identical to
 * `filter(split(trim(text), "\s+"), t => t != "")`: the array of maximal
 * runs of non-`\s` bytes (`\s` = Java regex class: space \t \n \x0B \f
 * \r; all single-byte, so multi-byte UTF-8 passes through). Feeds token
 * counting, stopword/quality features, language-ID and shingling without
 * a per-row regex.
 */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ws_tokens requires a STRING argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WhitespaceTokens.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WhitespaceTokens.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WhitespaceTokens {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_ws_tokens"),
    new ExpressionInfo(classOf[WhitespaceTokens].getName, "graft_ws_tokens"),
    { children =>
      require(children.size == 1, "graft_ws_tokens(str) takes 1 argument")
      WhitespaceTokens(children.head)
    }
  )

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def split(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      val start = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}
