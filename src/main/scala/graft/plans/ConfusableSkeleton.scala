package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Confusable skeleton — homoglyph normalization in the spirit of
 * Unicode TR39's skeleton(): spam, SEO mirrors, and dedup-evasion
 * copies swap Latin letters for visually-identical Cyrillic/Greek
 * codepoints and sprinkle zero-width characters, which defeats every
 * byte-level fingerprint in the dedup family while leaving the
 * rendered text identical. Mapping to a canonical skeleton FIRST makes
 * the spoofed copy hash-equal to its source, so the whole exact-dedup
 * machinery (xxhash64 fingerprints, clustering, savings accounting)
 * works unchanged on top.
 *
 * The table is a fixed, documented subset of the public TR39
 * confusables (the high-traffic Latin lookalikes), NOT the full data
 * file — additions belong here, in code, where the mapping stays
 * reviewable and replayable:
 *  - stripped: ZWSP/ZWNJ/ZWJ (U+200B..D), WORD JOINER (U+2060),
 *    BOM/ZWNBSP (U+FEFF), SOFT HYPHEN (U+00AD)
 *  - NBSP (U+00A0) → space
 *  - fullwidth ASCII (U+FF01..FF5E) → ASCII
 *  - Cyrillic lookalikes: а е о р с у х і ј ѕ → a e o p c y x i j s,
 *    А В Е К М Н О Р С Т У Х → A B E K M N O P C T Y X
 *  - Greek capital lookalikes: Α Β Ε Ζ Η Ι Κ Μ Ν Ο Ρ Τ Υ Χ → latin,
 *    Greek ο ν → o v
 *
 * Scale shape: one narrow codegen'd pass per row (the [[SubwordCount]]
 * reference-object pattern); the common all-ASCII row takes a scan +
 * zero-copy return (no allocation unless something maps).
 */
case class ConfusableSkeleton(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_confusable_skeleton"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_confusable_skeleton requires a STRING argument, got ${child.dataType}")

  def skeleton(input: UTF8String): UTF8String = {
    val s = input.toString
    var i = 0
    // fast path: nothing below maps for pure ASCII
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return input
    val b = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!ConfusableSkeleton.strip(c)) {
        val m = ConfusableSkeleton.map(c)
        b.append(if (m != '\u0000') m else c)
      }
      i += 1
    }
    UTF8String.fromString(b.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    skeleton(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("confusableSkeleton", this,
      classOf[ConfusableSkeleton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.skeleton($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ConfusableSkeleton {

  /** ZWSP, ZWNJ, ZWJ, WORD JOINER, BOM/ZWNBSP, SOFT HYPHEN. */
  @inline private[plans] def strip(c: Char): Boolean =
    c == '\u200B' || c == '\u200C' || c == '\u200D' || c == '\u2060' ||
    c == '\uFEFF' || c == '\u00AD'

  /** Returns the mapped char, or NUL when `c` does not map (nothing
    * maps TO NUL, so the sentinel is unambiguous; unmapped chars pass
    * through unchanged in [[ConfusableSkeleton.skeleton]]).
    */
  private[plans] def map(c: Char): Char = {
    if (c == '\u00A0') return ' '                     // NBSP -> space
    if (c >= '\uFF01' && c <= '\uFF5E') return (c - 0xFEE0).toChar // fullwidth
    c.toInt match {
      // Cyrillic lowercase lookalikes
      case 0x0430 => 'a'; case 0x0435 => 'e'; case 0x043E => 'o'
      case 0x0440 => 'p'; case 0x0441 => 'c'; case 0x0443 => 'y'
      case 0x0445 => 'x'; case 0x0456 => 'i'; case 0x0458 => 'j'
      case 0x0455 => 's'
      // Cyrillic capital lookalikes
      case 0x0410 => 'A'; case 0x0412 => 'B'; case 0x0415 => 'E'
      case 0x041A => 'K'; case 0x041C => 'M'; case 0x041D => 'N'
      case 0x041E => 'O'; case 0x0420 => 'P'; case 0x0421 => 'C'
      case 0x0422 => 'T'; case 0x0423 => 'Y'; case 0x0425 => 'X'
      // Greek capital lookalikes
      case 0x0391 => 'A'; case 0x0392 => 'B'; case 0x0395 => 'E'
      case 0x0396 => 'Z'; case 0x0397 => 'H'; case 0x0399 => 'I'
      case 0x039A => 'K'; case 0x039C => 'M'; case 0x039D => 'N'
      case 0x039F => 'O'; case 0x03A1 => 'P'; case 0x03A4 => 'T'
      case 0x03A5 => 'Y'; case 0x03A7 => 'X'
      // Greek lowercase lookalikes
      case 0x03BF => 'o'; case 0x03BD => 'v'
      case _ => '\u0000'
    }
  }
}
