package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC (canonical composition) normalization — the text-identity
 * step a multilingual curation pipeline runs BEFORE any dedup or
 * fingerprinting: "é" typed as one codepoint and "é" typed as
 * e + COMBINING ACUTE are the same text to a reader but different bytes
 * to every hash in the engine, so un-normalized corpora silently split
 * duplicate groups and double-count n-grams. Spark has no built-in
 * normalizer; this wraps `java.text.Normalizer` (ICU-equivalent NFC per
 * Unicode TR15 — DuckDB's `nfc_normalize` computes the identical form,
 * which is what makes the gate oracle exact).
 *
 * The common case is a no-op: `Normalizer.isNormalized` is a cheap scan
 * (pure-ASCII text short-circuits on the first pass), and only strings
 * that actually contain decomposed sequences pay the composition walk —
 * so heading a 100 TB pipeline with this costs ~one extra byte scan on
 * clean data.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc_normalize requires a STRING argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc_normalize"),
    { children =>
      require(children.size == 1, "graft_nfc_normalize(str) takes 1 argument")
      NfcNormalize(children.head)
    }
  )

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
