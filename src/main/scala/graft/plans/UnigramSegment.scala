package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-LM Viterbi segmentation of ONE word — the inference side of
 * the SentencePiece-unigram tokenizer (Kudo 2018), completing the
 * library's tokenizer family next to BPE (merge-rank replay) and
 * WordPiece (greedy longest-match): where WordPiece commits to the
 * longest piece at each position, unigram picks the GLOBALLY cheapest
 * segmentation under per-piece costs (scaled −log-prob integers).
 *
 * DP over char positions, minimizing the PACKED objective
 * `cost·16 + n_tokens` (lexicographic: total cost first, then piece
 * count — the packing bounds are enforced: words ≤ 15 chars, so
 * n_tokens < 16; see `maxWordLen`): at position p the best state
 * extends either a vocabulary piece ending at p or a single-codepoint
 * UNK of cost `unkCost`. Pure integer work, bit-replayable by an
 * engine that unrolls the same positions (the gate oracle does, as a
 * CTE chain with the identical packing).
 *
 * Returns `[cost, n_tokens]`; null for null input; words longer than
 * `maxWordLen` REFUSE loudly (the caller filters — the oracle's
 * unrolled depth must match, and a silent fallback would diverge).
 *
 * Scale shape: a narrow codegen'd scalar (reference-object pattern);
 * pieces index by LAST char once per executor, so a position probes
 * only pieces that can possibly end there.
 */
case class UnigramSegmentWord(
    child: Expression,
    pieces: Seq[(String, Long)],
    unkCost: Long,
    maxWordLen: Int = 15
) extends UnaryExpression {

  require(pieces.nonEmpty, "graft_unigram_segment: pieces must be non-empty")
  require(pieces.forall(_._1.nonEmpty), "graft_unigram_segment: empty piece")
  require(pieces.forall(p => p._2 >= 0L && p._2 < (1L << 40)),
    s"graft_unigram_segment: piece costs must be in [0, 2^40)")
  require(pieces.map(_._1).distinct.size == pieces.size,
    "graft_unigram_segment: duplicate piece")
  require(unkCost >= 0L && unkCost < (1L << 40),
    s"graft_unigram_segment: unkCost must be in [0, 2^40), got $unkCost")
  require(maxWordLen >= 1 && maxWordLen <= 15,
    s"graft_unigram_segment: maxWordLen must be in [1, 15], got $maxWordLen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_segment requires a STRING argument, got ${child.dataType}")

  // last char -> (piece, cost), probed at each ending position
  @transient private lazy val byEnd: Map[Char, Array[(String, Long)]] =
    pieces.groupBy(_._1.last).map { case (c, g) => c -> g.toArray }

  def segment(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val n = s.length
    require(n <= maxWordLen,
      s"graft_unigram_segment: word '$s' exceeds maxWordLen=$maxWordLen — " +
        "filter long words upstream (the oracle's unrolled depth must match)")
    // dp(p) = min over segmentations of s[0..p): cost*16 + ntokens
    val dp = new Array[Long](n + 1)
    var p = 1
    while (p <= n) {
      // UNK single char
      var best = dp(p - 1) + unkCost * 16L + 1L
      val cands = byEnd.getOrElse(s.charAt(p - 1), UnigramSegmentWord.none)
      var i = 0
      while (i < cands.length) {
        val (piece, cost) = cands(i)
        val len = piece.length
        if (len <= p && s.regionMatches(p - len, piece, 0, len)) {
          val cand = dp(p - len) + cost * 16L + 1L
          if (cand < best) best = cand
        }
        i += 1
      }
      dp(p) = best
      p += 1
    }
    new GenericArrayData(Array[Any](dp(n) >> 4, dp(n) & 15L))
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this,
      classOf[UnigramSegmentWord].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegmentWord {
  private[plans] val none: Array[(String, Long)] = Array.empty
}
