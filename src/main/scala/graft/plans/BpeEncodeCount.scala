package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE-encode token count under a frozen ranked merge list — the native
 * kernel behind [[graft.functions.TextFunctions.bpeTokenCount]].
 *
 * Semantics are EXACTLY the documented replace-chain (rank-order global
 * application, the trainer's own substitution rule — see
 * `bpeTokenCount`'s scaladoc and the `bpe_encode_count` oracle): each
 * whitespace word of the (already-lowercased) input is spelled as
 * space-joined CODE POINTS (Spark's `split(w, "")` keeps surrogate
 * pairs whole — probed, not assumed), then every merge `(a, b)` runs in
 * rank order as ONE global leftmost-nonoverlapping string replace of
 * `"a b"` with `"ab"` on the spelled form. The replace is a STRING
 * match, so `a` may bind a SUFFIX of the left symbol and `b` a PREFIX
 * of the right one — that is the established operator contract (both
 * engines replay it with plain `replace` chains) and this kernel
 * preserves it bit-for-bit rather than "fixing" it to symbol-level
 * adjacency. The word's token count is final spaces + 1; counts sum
 * over the document's words; empty/blank text → 0.
 *
 * Why a native kernel (round-9 verdict #5): folding one `replace` per
 * merge into the expression tree is correct but a production 32k-merge
 * vocabulary means a 32k-deep chained-replace tree — Janino's method
 * size limits force whole-stage codegen to give up, and every merge
 * allocates a full copy of the word whether or not it matches. Here the
 * merge list is carried in the expression (a model artifact, same cost
 * class as a broadcast literal table — the [[SubwordCount]] precedent)
 * and organized once per executor into:
 *
 *  - a pattern/replacement pair per rank, and
 *  - a 64-bit character bloom mask per rank.
 *
 * Per word we compute the same 64-bit mask over its characters once;
 * a rank whose pattern needs a character the word never had is skipped
 * with one AND (merging only deletes spaces, so the word mask computed
 * up front stays a superset for the whole chain — false "might match"
 * is possible, false "can't match" is not). Surviving ranks pay one
 * `indexOf` probe and allocate only when a match exists. Effective
 * cost: O(merges) bit-tests + O(applicable merges × word length) —
 * for natural-language words (≤ ~16 distinct characters) almost the
 * entire 32k-rank list falls to the mask test.
 *
 * Scale shape: a scalar projection — narrow, no shuffle, no state,
 * codegen'd via the reference-object pattern. Compose with the
 * corpus→distinct-word histogram discipline (`Vocab`) upstream when
 * encoding a 100 TB corpus: encode each distinct word once, join the
 * counts back.
 */
case class BpeEncodeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "graft_bpe_encode_count: merge list must be non-empty")
  require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" ") },
    s"graft_bpe_encode_count: merge symbols must be non-empty and space-free, got $merges")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_encode_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode_count requires a STRING argument, got ${child.dataType}")

  // pattern ("a b"), fused replacement ("ab"), 64-bit char bloom of the
  // pattern — built once per executor
  @transient private lazy val (patterns, fused, masks) = {
    val p = new Array[String](merges.length)
    val f = new Array[String](merges.length)
    val m = new Array[Long](merges.length)
    var i = 0
    merges.foreach { case (a, b) =>
      val pat = a + " " + b
      p(i) = pat
      f(i) = a + b
      var mask = 0L
      var j = 0
      while (j < pat.length) { mask |= 1L << (pat.charAt(j) & 63); j += 1 }
      m(i) = mask
      i += 1
    }
    (p, f, m)
  }

  def count(input: UTF8String): Long = {
    val s = input.toString
    val len = s.length
    var total = 0L
    var i = 0
    while (i < len) {
      while (i < len && SubwordCount.isWs(s.charAt(i))) i += 1
      if (i < len) {
        val w0 = i
        while (i < len && !SubwordCount.isWs(s.charAt(i))) i += 1
        total += countWord(s, w0, i)
      }
    }
    total
  }

  /** One word's token count: spell by code point, run the merge chain,
    * count spaces + 1.
    */
  private def countWord(s: String, from: Int, until: Int): Long = {
    // spelled form: code points joined by single spaces (split(w, "")
    // keeps surrogate pairs whole); word mask covers its chars + space
    val sb = new java.lang.StringBuilder((until - from) * 2)
    var wordMask = 1L << (' ' & 63)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      wordMask |= 1L << (c & 63)
      if (i > from) sb.append(' ')
      sb.append(c)
      if (Character.isHighSurrogate(c) && i + 1 < until &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        wordMask |= 1L << (s.charAt(i + 1) & 63)
        sb.append(s.charAt(i + 1))
        i += 2
      } else i += 1
    }
    var cur = sb.toString
    var r = 0
    while (r < patterns.length) {
      if ((masks(r) & ~wordMask) == 0L) {
        val pat = patterns(r)
        var at = cur.indexOf(pat)
        if (at >= 0) {
          // global leftmost-nonoverlapping replace (String.replace's
          // rule, UTF8String.replace's rule — one pass, no re-scan of
          // the substituted text)
          val out = new java.lang.StringBuilder(cur.length)
          var idx = 0
          while (at >= 0) {
            out.append(cur, idx, at).append(fused(r))
            idx = at + pat.length
            at = cur.indexOf(pat, idx)
          }
          out.append(cur, idx, cur.length)
          cur = out.toString
        }
      }
      r += 1
    }
    var spaces = 0
    var j = 0
    while (j < cur.length) { if (cur.charAt(j) == ' ') spaces += 1; j += 1 }
    spaces + 1L
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeCount", this, classOf[BpeEncodeCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeCount {
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_encode_count"),
    new ExpressionInfo(classOf[BpeEncodeCount].getName, "graft_bpe_encode_count"),
    { children =>
      require(children.size >= 2 && children.size % 2 == 1,
        "graft_bpe_encode_count(str, a1, b1, a2, b2, ...) takes the text plus literal merge pairs")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val syms = children.tail.map {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_bpe_encode_count: merge symbols must be string literals, got $other")
      }
      BpeEncodeCount(children.head, syms.grouped(2).map(g => (g(0), g(1))).toSeq)
    }
  )
}
