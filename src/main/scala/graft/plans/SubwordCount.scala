package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Subword (WordPiece-style) token count over a fixed vocabulary — the
 * counter a training pipeline actually budgets in. Whitespace token
 * counts misprice packing/batching/truncation budgets because model
 * context windows are measured in SUBWORD tokens; this expression runs
 * the public WordPiece matching loop (Wu et al. 2016; the
 * greedy-longest-match inference tokenizer, not the vocab LEARNER)
 * against a vocabulary fixed at plan time:
 *
 *  - the text splits into whitespace words (space \t \n \x0B \f \r —
 *    the [[WhitespaceTokens]] class);
 *  - within a word, repeatedly take the LONGEST vocabulary piece
 *    matching at the current position — word-initial positions match
 *    plain pieces, word-internal positions match `##`-prefixed
 *    continuation pieces (the WordPiece position marking);
 *  - if nothing matches, count one `[UNK]` token for the single
 *    CODEPOINT at the position and continue (per-character fallback —
 *    a deliberate, documented divergence from canonical WordPiece's
 *    whole-word `[UNK]`, chosen because a length budget should degrade
 *    smoothly on out-of-vocabulary words rather than collapse a
 *    50-char word and a 3-char word to the same cost of 1).
 *
 * The loop is deterministic integer/string work — no floats, no
 * hashes — so an external engine replays it exactly (the gate oracle
 * re-runs the same greedy match as a recursive SQL CTE over distinct
 * words; see `subword_count` in SparkEntry).
 *
 * Scale shape: a scalar projection (narrow, codegen'd via the
 * reference-object pattern the other vocab-carrying expressions use);
 * the vocabulary is carried in the expression and organized once per
 * executor into per-first-char arrays sorted longest-first, so the
 * per-position cost is a handful of `regionMatches` calls, not a scan
 * of the whole vocabulary. Vocabularies are model artifacts
 * (10k–100k entries, kilobytes to ~MB serialized) — plan-shipping one
 * is the same cost class as a broadcast literal table.
 */
case class SubwordCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "graft_subword_count: vocabulary must be non-empty")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_subword_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_subword_count requires a STRING argument, got ${child.dataType}")

  // (firstChar -> pieces sorted longest-first), split by position class.
  // Built once per executor (transient lazy), keyed by first char so a
  // position probes only pieces that can possibly match.
  @transient private lazy val (startIdx, contIdx) = SubwordCount.index(vocab)

  def count(input: UTF8String): Long = {
    val s = input.toString
    val len = s.length
    var total = 0L
    var i = 0
    while (i < len) {
      // skip whitespace run
      while (i < len && SubwordCount.isWs(s.charAt(i))) i += 1
      if (i < len) {
        // consume one word
        var first = true
        while (i < len && !SubwordCount.isWs(s.charAt(i))) {
          val idx = if (first) startIdx else contIdx
          val cands = idx.getOrElse(s.charAt(i), SubwordCount.noPieces)
          var matched = 0
          var c = 0
          // pieces contain no whitespace (enforced at build), so a
          // match can never run across the word boundary
          while (matched == 0 && c < cands.length) {
            val p = cands(c)
            if (i + p.length <= len && s.regionMatches(i, p, 0, p.length)) {
              matched = p.length
            }
            c += 1
          }
          if (matched > 0) { total += 1; i += matched }
          else {
            // [UNK]: one token for one CODEPOINT (surrogate-pair aware)
            total += 1
            i += (if (Character.isHighSurrogate(s.charAt(i)) && i + 1 < len &&
              Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
          }
          first = false
        }
      }
    }
    total
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordCount", this, classOf[SubwordCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCount {

  private[plans] val noPieces: Array[String] = Array.empty

  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Split a `##`-marked vocabulary into (start, continuation) indexes:
    * first char → pieces (marker stripped) sorted longest-first; ties
    * impossible (duplicate pieces are rejected — a duplicate would make
    * "the longest match" ambiguous only in spelling, but it signals a
    * malformed vocab).
    */
  private[plans] def index(vocab: Seq[String])
      : (Map[Char, Array[String]], Map[Char, Array[String]]) = {
    val (cont, start) = vocab.partition(_.startsWith("##"))
    def build(ps: Seq[String]): Map[Char, Array[String]] = {
      require(ps.forall(_.nonEmpty), "graft_subword_count: empty piece in vocab")
      require(ps.forall(p => !p.exists(isWs)),
        "graft_subword_count: vocabulary pieces must not contain whitespace")
      require(ps.distinct.size == ps.size,
        "graft_subword_count: duplicate piece in vocab")
      ps.groupBy(_.charAt(0))
        .map { case (c, g) => c -> g.sortBy(p => (-p.length, p)).toArray }
    }
    (build(start), build(cont.map(_.substring(2))))
  }

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_subword_count"),
    new ExpressionInfo(classOf[SubwordCount].getName, "graft_subword_count"),
    { children =>
      require(children.size >= 2,
        "graft_subword_count(str, piece1, piece2, ...) takes the text plus literal pieces")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val pieces = children.tail.map {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_subword_count: vocabulary pieces must be string literals, got $other")
      }
      SubwordCount(children.head, pieces)
    }
  )
}
