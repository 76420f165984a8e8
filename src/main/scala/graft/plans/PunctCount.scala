package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count of `\p{Punct}` characters — semantically identical to
 * `length(regexp_replace(text, "[^\p{Punct}]", ""))` (the quality
 * scorer's punctuation-density numerator) as one byte scan: the 32 punct
 * chars are single-byte ASCII, so the byte count IS the char count, and
 * multi-byte sequences can never match.
 */
case class PunctCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_punct_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_punct_count requires a STRING argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PunctCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PunctCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PunctCount {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_punct_count"),
    new ExpressionInfo(classOf[PunctCount].getName, "graft_punct_count"),
    { children =>
      require(children.size == 1, "graft_punct_count(str) takes 1 argument")
      PunctCount(children.head)
    }
  )

  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
          (b >= '[' && b <= '`') || (b >= '{' && b <= '~')) n += 1
      i += 1
    }
    n
  }
}
