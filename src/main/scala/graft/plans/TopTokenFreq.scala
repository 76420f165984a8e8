package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multiplicity of the most frequent element of a token array, in one
 * pass — the per-document primitive behind repetition-based quality
 * filters (the "fraction of tokens in the most common token/n-gram"
 * family of rules from the public Gopher/MassiveText and RefinedWeb data
 * pipelines). Empty input → 0. Null elements are skipped.
 *
 * A composed form needs nested interpreted HOFs that re-walk the array
 * per distinct element (O(n·d)); this is one hashmap pass inside
 * whole-stage codegen. Works on word tokens and (via WordShingles) on
 * word n-grams alike.
 */
case class TopTokenFreq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_top_token_freq"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_top_token_freq requires ARRAY<STRING>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TopTokenFreq.maxFreq(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TopTokenFreq.maxFreq($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopTokenFreq {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_top_token_freq"),
    new ExpressionInfo(classOf[TopTokenFreq].getName, "graft_top_token_freq"),
    { children =>
      require(children.size == 1, "graft_top_token_freq(tokens) takes 1 argument")
      TopTokenFreq(children.head)
    }
  )

  def maxFreq(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](Math.min(n * 2, 1 << 16))
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = counts.get(t)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(t, Integer.valueOf(c))
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
