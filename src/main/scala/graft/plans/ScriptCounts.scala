package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Script-class codepoint counts in ONE byte walk: ARRAY<BIGINT> of
 * (non-whitespace, Han, kana, Hangul) codepoint counts. Feeds the
 * script-aware language-ID rules (TextFunctions.langIdWithScript), which
 * previously ran 4 full-text `regexp_extract_all` passes per row — the
 * counts are one codepoint walk away, the same single-pass shape as
 * [[MarkerCounts]] and [[CjkTokenCount]].
 *
 * Classes are EXPLICIT codepoint ranges (not \p{Han}-style script tables,
 * which can drift between engines), byte-identical to the oracle regexes:
 *  - non-ws:  not in {space \t \n \x0B \f \r} (the [[WhitespaceTokens]]
 *             whitespace class);
 *  - Han:     3400–4DBF, 4E00–9FFF, F900–FAFF, 20000–2FFFF;
 *  - kana:    3040–30FF (Hiragana + Katakana);
 *  - Hangul:  AC00–D7AF (precomposed syllables).
 * Decodes codepoints straight off the UTF-8 bytes — no per-row String.
 */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_script_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_script_counts requires a STRING argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    ScriptCounts.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ScriptCounts.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptCounts {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_script_counts"),
    new ExpressionInfo(classOf[ScriptCounts].getName, "graft_script_counts"),
    { children =>
      require(children.size == 1, "graft_script_counts(str) takes 1 argument")
      ScriptCounts(children.head)
    }
  )

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  @inline private def isHan(cp: Int): Boolean =
    (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x4E00 && cp <= 0x9FFF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) ||
    (cp >= 0x20000 && cp <= 0x2FFFF)

  @inline private def isKana(cp: Int): Boolean = cp >= 0x3040 && cp <= 0x30FF

  @inline private def isHangul(cp: Int): Boolean = cp >= 0xAC00 && cp <= 0xD7AF

  def count(s: UTF8String): GenericArrayData = {
    val nb = s.numBytes
    var i = 0
    var nonWs = 0L
    var han = 0L
    var kana = 0L
    var hangul = 0L
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
      if (!isWs(cp)) {
        nonWs += 1
        if (isHan(cp)) han += 1
        else if (isKana(cp)) kana += 1
        else if (isHangul(cp)) hangul += 1
      }
      i += width
    }
    new GenericArrayData(Array[Any](nonWs, han, kana, hangul))
  }
}
