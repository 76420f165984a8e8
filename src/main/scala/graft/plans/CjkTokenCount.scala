package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codepoint-class-aware token count — the CJK-robust counterpart of
 * whitespace token counting. Whitespace-delimited counting treats an
 * unsegmented Chinese/Japanese paragraph as ~1 token, silently
 * misgrading every length-based quality rule (Gopher word bounds, tokens
 * ∝ cost estimates) on non-space-delimited languages; the public
 * Gopher/C4-family practice is to count each CJK character as its own
 * token. Rule, in one codepoint pass:
 *  - whitespace (space \t \n \x0B \f \r — same class as
 *    [[WhitespaceTokens]]) separates tokens and counts nothing;
 *  - each CJK codepoint counts as ONE token and breaks any run;
 *  - a maximal run of other non-whitespace codepoints counts as ONE
 *    token (identical to whitespace tokenization for Latin-script text,
 *    so on CJK-free input this equals `tokenCount` exactly).
 *
 * "CJK" = the explicit ranges below (Hiragana, Katakana, CJK Ext A,
 * CJK Unified, Hangul syllables, CJK Compatibility Ideographs, and the
 * supplementary ideographic planes) — spelled as ranges, not \p{Han}
 * classes, so an oracle regex can reproduce the rule byte-for-byte
 * across engines.
 */
case class CjkTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cjk_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cjk_token_count requires a STRING argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CjkTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CjkTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CjkTokenCount {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cjk_token_count"),
    new ExpressionInfo(classOf[CjkTokenCount].getName, "graft_cjk_token_count"),
    { children =>
      require(children.size == 1, "graft_cjk_token_count(str) takes 1 argument")
      CjkTokenCount(children.head)
    }
  )

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** The ranges an oracle regex must mirror (see the gate SQL):
    * 3040–30FF 3400–4DBF 4E00–9FFF AC00–D7AF F900–FAFF 20000–2FFFF.
    */
  @inline def isCjk(cp: Int): Boolean =
    (cp >= 0x3040 && cp <= 0x30FF) || // Hiragana + Katakana
    (cp >= 0x3400 && cp <= 0x4DBF) || // CJK Extension A
    (cp >= 0x4E00 && cp <= 0x9FFF) || // CJK Unified Ideographs
    (cp >= 0xAC00 && cp <= 0xD7AF) || // Hangul syllables
    (cp >= 0xF900 && cp <= 0xFAFF) || // CJK Compatibility Ideographs
    (cp >= 0x20000 && cp <= 0x2FFFF)  // Ext B..F (supplementary planes)

  /** Allocation-free: decodes codepoints straight off the UTF-8 bytes
    * (valid UTF-8 is the UTF8String contract) — no per-row String. The
    * other native text expressions here are byte-walks too; this one sits
    * on the token-count path every multilingual quality rule calls, so a
    * per-row decode allocation would be the map-stage cost at 100 TB.
    */
  def count(s: UTF8String): Long = {
    val nb = s.numBytes
    var i = 0
    var n = 0L
    var inRun = false
    while (i < nb) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var width = 1
      if (b0 >= 0xF0) { width = 4; cp = b0 & 0x07 }
      else if (b0 >= 0xE0) { width = 3; cp = b0 & 0x0F }
      else if (b0 >= 0xC0) { width = 2; cp = b0 & 0x1F }
      var j = i + 1
      val end = if (i + width <= nb) i + width else nb
      while (j < end) { cp = (cp << 6) | (s.getByte(j) & 0x3F); j += 1 }
      if (isWs(cp)) inRun = false
      else if (isCjk(cp)) { n += 1; inRun = false }
      else if (!inRun) { n += 1; inRun = true }
      i += width
    }
    n
  }
}
