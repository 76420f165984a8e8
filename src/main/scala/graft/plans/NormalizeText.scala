package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text normalization for fingerprinting/dedup — the hottest
 * scalar in the engine (it heads EVERY text pipeline: exact dedup,
 * MinHash, SimHash, n-gram Jaccard, fingerprinting, the training-prep
 * pipeline).
 *
 * Semantically identical to the composed
 * `trim(regexp_replace(translate(lower(text), punct, ""), "\s+", " "))`:
 * Unicode lowercase (UTF8String.toLowerCase — the same call Spark's
 * `lower` makes), strip the 32 ASCII `\p{Punct}` chars, collapse
 * `[ \t\n\x0B\f\r]+` runs to one space, no leading/trailing space. One
 * byte scan instead of four string passes plus a regex; multi-byte UTF-8
 * sequences pass through untouched (punct/ws are all single-byte).
 */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_text requires a STRING argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_normalize_text"),
    new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
    { children =>
      require(children.size == 1, "graft_normalize_text(str) takes 1 argument")
      NormalizeText(children.head)
    }
  )

  /** The 32 chars of `\p{Punct}`: 33-47, 58-64, 91-96, 123-126. */
  @inline private def isPunct(b: Byte): Boolean =
    (b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
      (b >= '[' && b <= '`') || (b >= '{' && b <= '~')

  /** Java regex `\s`: space, \t, \n, \x0B, \f, \r — all single-byte. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val out = new Array[Byte](bytes.length)
    var j = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (isPunct(b)) ()                    // stripped
      else if (isWs(b)) pendingSpace = true // collapse; emit lazily
      else {
        if (pendingSpace && j > 0) { out(j) = ' '; j += 1 }
        pendingSpace = false
        out(j) = b
        j += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, j)
  }
}
