package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Sequence packing for training-data preparation: assign documents to
 * fixed-token-budget packs — the "concatenate and chunk" step that turns
 * a curated corpus into training sequences (every GPT-style pipeline
 * ends with it; packing density directly sets tokens-per-step).
 *
 * Semantics: within each stratum, documents are laid out in `orderCol`
 * order on one conceptual token tape; a document belongs to the pack its
 * FIRST token falls into (`pack_id = floor(preceding_tokens / budget)`).
 * This is the deterministic concat-and-chunk rule, not bin packing: a
 * doc can straddle a boundary (its tail spills into the next pack, as
 * the training tokenizer's chunker would), packs average exactly
 * `budget` tokens, and the assignment is reproducible by any engine
 * with a window sum — no greedy state machine, no first-fit heuristics.
 *
 * Scale shape: one shuffle on the strata (inherent — packing is
 * ORDER-defined within a stratum, so the stratum's docs must meet), a
 * per-partition sort by `orderCol`, and a running sum; token counts ride
 * along as longs. Strata bound the sort: pack within (source, shard) —
 * never one global stratum — and each task sorts only its strata. The
 * window here IS the algorithm (a running total), not a reduction a
 * hash aggregate could do.
 */
object Packing {

  /** Adds `pack_id` (0-based within the stratum) and `pack_offset` (the
    * doc's first-token position within its pack). `tokens` is the
    * per-doc token count column (e.g. `TextFunctions.tokenCount` — or
    * `tokenCountCjk` for multilingual mixes, computed upstream so the
    * count is visible to the caller too).
    *
    * `strataCols` is REQUIRED at scale: an empty list means ONE global
    * stratum — `Window.partitionBy()` with every row through a single
    * task, a driver-adjacent funnel at 100 TB. That path is refused
    * unless the caller passes `allowGlobal = true` (small/test corpora
    * where a single sorted tape is genuinely wanted).
    */
  def packByTokenBudget(
      df: DataFrame,
      tokens: Column,
      orderCol: String,
      budget: Long,
      strataCols: Seq[String] = Seq.empty,
      allowGlobal: Boolean = false
  ): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(strataCols.nonEmpty || allowGlobal,
      "packByTokenBudget with no strataCols sorts EVERY row in one task " +
        "(a global single-stratum window); pass strata (e.g. source/shard) " +
        "or allowGlobal = true if the corpus is known to be small")
    val w = (if (strataCols.nonEmpty)
        Window.partitionBy(strataCols.map(col): _*)
      else Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not Column `/` (double division — rounds past 2^53,
    // and a training corpus CAN exceed 9e15 cumulative tokens)
    df.withColumn("_prev", (sum(tokens).over(w) - tokens).cast(LongType))
      .withColumn("pack_id", expr(s"_prev div ${budget}L"))
      .withColumn("pack_offset", (col("_prev") % budget).cast(LongType))
      .drop("_prev")
  }

  /** Materialize the packed TRAINING SEQUENCES from
    * [[packByTokenBudget]]'s assignment: one row per (strata, pack_id)
    * with the member texts concatenated in `orderCol` order around the
    * `eos` separator — the actual sequence a data loader tokenizes —
    * plus `n_docs` and the exact member token sum. The missing last
    * step between a pack ASSIGNMENT and a training shard file.
    *
    * Scale shape: the groupBy rides the same (strata) exchange the
    * packing window created (composed directly, Catalyst reuses it);
    * each group materializes ≈`budget` tokens of text by construction
    * — a pack is budget-bounded, so no group ever exceeds ~budget
    * tokens plus one straddling tail, and `collect_list` state is
    * bounded the same way. `sort_array` on (order, text) structs makes
    * the concatenation order total without a per-group window.
    */
  def materializePacks(
      packed: DataFrame,
      textCol: String,
      tokens: Column,
      orderCol: String,
      strataCols: Seq[String] = Seq.empty,
      eos: String = " <eos> "
  ): DataFrame =
    packed
      .groupBy((strataCols :+ "pack_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokens).cast(LongType).as("n_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(orderCol), col(textCol)))),
            e => e.getField(textCol)),
          eos).as("seq"))

  /** Pack-level summary: docs per pack and total tokens STARTING in each
    * pack (boundary-straddling tails count toward the pack they start
    * in). The aggregate reuses the packing exchange when composed
    * directly on [[packByTokenBudget]]'s output.
    */
  def packSummary(
      packed: DataFrame,
      tokens: Column,
      strataCols: Seq[String] = Seq.empty
  ): DataFrame =
    packed.groupBy((strataCols :+ "pack_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))

  /** Length-bucketed batch assignment — the padding-efficiency step for
    * UNPACKED loaders (fine-tune / eval / reward-model batches, where
    * documents stay separate sequences and short+long partners waste
    * pad tokens): bucket documents by token-count range (`bucket =
    * n_tokens div bucketWidth`), then batch bucket-mates in
    * deterministic ascending-id order, `batchSize` at a time. Output:
    * `(<idCol>, n_tokens, bucket, batch_idx, slot)` — batch_idx 0-based
    * within the bucket, slot 0-based within the batch. A batch's pad
    * waste is bounded by `(bucketWidth−1)·batchSize` tokens by
    * construction (all partners share a length range).
    *
    * Scale shape: length-buckets are FEW and HUGE at corpus scale
    * (most of a web corpus lands in a handful of ranges), so the naive
    * `Window.partitionBy(bucket)` row_number is exactly the skew
    * funnel to avoid — within-bucket ranks use the TWO-LEVEL bucketed
    * prefix design ([[Sampling.withinGroupRanks]]): id-range sub-bucket
    * counts reduce map-side, offsets ride a window over histogram rows
    * only, and `row_number` runs per (bucket, id-sub-bucket). One
    * tokenize pass; ids+counts are all that shuffle.
    */
  def lengthBucketBatches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bucketWidth: Int = 64,
      batchSize: Int = 32,
      rankBuckets: Int = 1024,
      // pluggable counter (default whitespace): pass e.g.
      // TextFunctions.tokenCountSubword(_, vocab) or tokenCountCjk to
      // bucket in the units the loader actually pads in
      tokenCounter: Column => Column = graft.functions.TextFunctions.tokenCount
  ): DataFrame = {
    require(bucketWidth > 0, s"lengthBucketBatches: bucketWidth must be positive, got $bucketWidth")
    require(batchSize > 0, s"lengthBucketBatches: batchSize must be positive, got $batchSize")
    val base = docs.select(
        col(idCol).cast(LongType).as("_k"),
        tokenCounter(col(textCol)).as("_n"))
      .withColumn("_g", expr(s"_n div ${bucketWidth}L"))
      // _n (hence _g) is null for null text: withinGroupRanks' inner
      // join on (_g, _b) silently drops null-group rows (null keys
      // never match), so pre-filter them explicitly like epochSchedule
      // does — a null-text doc has no length bucket to batch into
      .filter(col("_k").isNotNull && col("_n").isNotNull)
    Sampling.withinGroupRanks(base.select(col("_g"), col("_k"), col("_n")), rankBuckets) match {
      case None => base.select(
        col("_k").as(idCol), col("_n").as("n_tokens"),
        col("_g").as("bucket"), lit(0L).as("batch_idx"), lit(0L).as("slot"))
        .limit(0)
      case Some(ranked) =>
        ranked
          .withColumn("_rk0", col("_rank") - 1L)
          .select(
            col("_k").as(idCol),
            col("_n").as("n_tokens"),
            col("_g").as("bucket"),
            expr(s"_rk0 div ${batchSize}L").as("batch_idx"),
            (col("_rk0") % batchSize).cast(LongType).as("slot"))
    }
  }

  /** Per-batch padding accounting over [[lengthBucketBatches]]' output:
    * `(bucket, batch_idx, n_docs, max_tokens, sum_tokens, pad_waste)`
    * where `pad_waste = max_tokens·n_docs − sum_tokens` — the pad
    * tokens a rectangular batch tensor spends. Pure integer aggregate
    * of an already-shuffled assignment (reuses its exchange when
    * composed directly).
    */
  def paddingWaste(batches: DataFrame): DataFrame =
    batches.groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_waste",
        (col("max_tokens") * col("n_docs") - col("sum_tokens")).cast(LongType))

  /** RAG-style sliding-window chunking: split each document into
    * overlapping windows of `chunkTokens` whitespace tokens with
    * `overlapTokens` carried between consecutive chunks. Output: one
    * row per chunk — `(<idCol>, chunk_idx, chunk_text, n_tokens)` —
    * where `chunk_text` rejoins the window's tokens with single spaces
    * (the retrieval-index normalization; original inter-token
    * whitespace is not preserved). Window starts step by
    * `chunkTokens - overlapTokens`; the LAST window is the first one
    * reaching the document's end, so no trailing chunk is pure overlap
    * of its predecessor. Zero-token docs yield no rows (left-join back
    * if every id must survive).
    *
    * Scale shape: entirely NARROW — tokenize, a per-row
    * `sequence(0, numChunks-1)` explode, and a `slice` per chunk; no
    * shuffle anywhere, so it composes with a downstream repartition or
    * write without constraining the plan. Chunk counts use integer
    * arithmetic on longs (`div`), exact at any document length.
    *
    * Counter pluggability boundary: the budget consumers
    * ([[packByTokenBudget]], [[lengthBucketBatches]]) accept any
    * per-doc COUNT column (whitespace / CJK / subword); chunking and
    * truncation slice at token POSITIONS, which a count can't provide —
    * a subword-budget chunker would need the segmentation offsets, not
    * just the total, so these two stay whitespace-token-based by
    * design.
    */
  /** Padding-OPTIMAL length-bucket boundaries — the principled version
    * of [[lengthBucketBatches]]'s fixed-width buckets: choose `numBuckets`
    * contiguous length ranges minimizing TOTAL padding when every row
    * pads to its bucket's max length (the dynamic-batching objective —
    * padding is wasted compute, so at training scale percentage points
    * of padding are GPU-hours). This is 1-D Jenks/Fisher optimal
    * breaks with the padding cost, solved EXACTLY by dynamic
    * programming over the length histogram:
    *
    *   cost(i..j) = Σ_{l ∈ [i..j]} cnt_l · (len_j − l)
    *              = len_j·C(i..j) − S(i..j)   (prefix sums, O(1)/cell)
    *
    * Scale shape: the corpus-scale work is ONE map-side-combined
    * `groupBy(length).count()` histogram; the DP runs driver-side on
    * the ≤ `maxDistinct` distinct lengths (O(B·D²) — milliseconds at
    * the enforced cap; sequence lengths are bounded by context windows,
    * so D stays small at ANY corpus size, which is exactly why the
    * histogram-then-driver-DP split is the right 100 TB shape). Ties
    * between equal-cost splits break toward the SMALLEST split index
    * (strict `<` improvement), making the boundaries engine-stable.
    *
    * Returns per-bucket `(lo, hi)` inclusive length bounds, ascending,
    * exactly `min(numBuckets, D)` of them.
    */
  def optimalLengthBucketBounds(
      df: DataFrame,
      length: Column,
      numBuckets: Int,
      maxDistinct: Int = 4096
  ): Seq[(Long, Long)] = {
    require(numBuckets >= 1, s"optimalLengthBucketBounds: numBuckets >= 1, got $numBuckets")
    val hist = df.select(length.cast(LongType).as("_l"))
      .filter(col("_l").isNotNull && col("_l") >= 0L)
      .groupBy("_l").agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(hist.nonEmpty, "optimalLengthBucketBounds: no non-null lengths")
    require(hist.length <= maxDistinct,
      s"optimalLengthBucketBounds: ${hist.length} distinct lengths exceeds " +
        s"maxDistinct=$maxDistinct — bucket lengths upstream (e.g. div 8) first")
    val d = hist.length
    val b = math.min(numBuckets, d)
    val lens = hist.map(_._1)
    val cumC = hist.scanLeft(0L)(_ + _._2).tail          // counts prefix
    val cumS = hist.scanLeft(0L)((a, h) => a + h._1 * h._2).tail // len·cnt prefix
    def cost(i: Int, j: Int): Long = { // distinct-length indices, inclusive
      val cc = cumC(j) - (if (i == 0) 0L else cumC(i - 1))
      val ss = cumS(j) - (if (i == 0) 0L else cumS(i - 1))
      lens(j) * cc - ss
    }
    // dp(k)(j) = min padding covering lengths [0..j] with k+1 buckets
    val dp = Array.fill(b, d)(Long.MaxValue)
    val cut = Array.fill(b, d)(0)
    for (j <- 0 until d) dp(0)(j) = cost(0, j)
    for (k <- 1 until b; j <- k until d; i <- k to j) {
      val c = dp(k - 1)(i - 1) + cost(i, j)
      if (c < dp(k)(j)) { dp(k)(j) = c; cut(k)(j) = i }
    }
    // walk back the cuts
    val bounds = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    var j = d - 1
    var k = b - 1
    while (k >= 0) {
      val i = if (k == 0) 0 else cut(k)(j)
      bounds.prepend((lens(i), lens(j)))
      j = i - 1
      k -= 1
    }
    bounds.toSeq
  }

  /** Per-bucket padding accounting under [[optimalLengthBucketBounds]]-
    * style `(lo, hi)` bounds: every row pads to its bucket's `hi`.
    * Output: `(bucket, lo, hi, n_rows, sum_tokens, padded_tokens,
    * waste_tokens)` — all BIGINT, one corpus pass (bounds broadcast).
    */
  def paddingReport(
      df: DataFrame,
      length: Column,
      bounds: Seq[(Long, Long)]
  ): DataFrame = {
    require(bounds.nonEmpty, "paddingReport: bounds must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = bounds.zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("bucket", "lo", "hi")
    df.select(length.cast(LongType).as("_l"))
      .filter(col("_l").isNotNull && col("_l") >= 0L)
      .join(broadcast(bdf), col("_l") >= col("lo") && col("_l") <= col("hi"))
      .groupBy("bucket", "lo", "hi")
      .agg(count(lit(1)).as("n_rows"), sum(col("_l")).as("sum_tokens"))
      .select(col("bucket"), col("lo"), col("hi"), col("n_rows"),
        col("sum_tokens"),
        (col("n_rows") * col("hi")).as("padded_tokens"),
        (col("n_rows") * col("hi") - col("sum_tokens")).as("waste_tokens"))
  }

  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0
  ): DataFrame = {
    require(chunkTokens > 0, "chunkByTokens: chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunkByTokens: overlapTokens must be in [0, chunkTokens) — " +
        s"got $overlapTokens of $chunkTokens (a stride of zero never advances)")
    val stride = chunkTokens - overlapTokens
    val toks = df.select(col(idCol),
      graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")).cast(LongType))
      // 1 + ceil(max(0, n - chunk) / stride), in exact integer div
      .withColumn("_nchunks",
        when(col("_n") === 0, lit(0L)).otherwise(
          expr(s"1L + (greatest(_n - ${chunkTokens}L, 0L) + ${stride - 1}L) div ${stride}L")))
    toks
      // _n = 0 would make sequence(0, -1) DESCEND ([0, -1]) — zero-token
      // docs are dropped here, which is also the documented contract
      .filter(col("_n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("_nchunks") - 1)).as("chunk_idx"),
        col("_toks"))
      .withColumn("_win",
        slice(col("_toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("_win"), " ").as("chunk_text"),
        size(col("_win")).cast(LongType).as("n_tokens"))
  }

  /** Content-defined chunking (CDC) over the token stream — the
    * dedup-friendly alternative to [[chunkByTokens]]' fixed windows
    * (public technique: gear/Rabin content-defined chunking from
    * storage dedup, applied to token sequences). Token j (1-based,
    * j ≥ 2) STARTS a new chunk iff
    * `FNV-1a(t_{j-1} ⧺ ' ' ⧺ t_j ⧺ ':salt') mod divisor == 0` — the
    * boundary depends only on its local 2-token context, so inserting
    * or deleting tokens moves ONLY the boundaries whose context
    * changed, and identical passages shared by two docs chunk
    * identically wherever they sit (fixed-width chunking shifts every
    * downstream boundary, defeating chunk-level dedup). Expected chunk
    * length ≈ `divisor` tokens (power of two, so the signed-long low
    * bits equal the unsigned mod any engine computes).
    *
    * Deliberately NO min/max chunk clamps: the clamped variant threads
    * state through the whole doc (a sequential scan), while the pure
    * gear rule stays embarrassingly parallel; compose with
    * [[chunkByTokens]] on oversized chunks if a hard cap is needed.
    *
    * Scale shape: one exchange on the doc id (inherent — a doc's
    * tokens must meet to reassemble chunks); the running boundary
    * count windows per doc, bounded by the doc's own length, never the
    * corpus. Output: `(idCol, chunk_idx, chunk_text, n_tokens)`.
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int = 16,
      salt: String = "cdc"
  ): DataFrame = {
    require(divisor >= 2 && (divisor & (divisor - 1)) == 0,
      s"cdcChunks: divisor must be a power of two >= 2, got $divisor")
    import org.apache.spark.sql.graft.ColumnBridge
    val fnv = (s: Column) =>
      ColumnBridge.column(graft.plans.FnvHash64(ColumnBridge.expression(s)))
    val tok = df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("_pos", "_t")))
    val w = Window.partitionBy(idCol).orderBy("_pos")
    val h = fnv(concat(col("_prev"), lit(" "), col("_t"), lit(":" + salt)))
    val flag = when(col("_prev").isNull, lit(0L))
      .otherwise(when(h.bitwiseAND(lit((divisor - 1).toLong)) === 0, lit(1L))
        .otherwise(lit(0L)))
    tok
      .withColumn("_prev", lag(col("_t"), 1).over(w))
      .withColumn("_chunk",
        sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("_chunk").as("chunk_idx"))
      .agg(
        array_join(transform(
            sort_array(collect_list(struct(col("_pos"), col("_t")))),
            e => e.getField("_t")), " ").as("chunk_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** Sentence segmentation — explode each document into its sentences
    * with a stable 0-based index, the unit RAG pipelines and
    * sentence-level dedup/quality filters work at. The boundary rule
    * is deliberately regex-portable (no lookbehind, which RE2-based
    * engines lack): a terminator `[.!?]` followed by spaces ends a
    * sentence, implemented by rewriting `([.!?]) +` to the terminator
    * plus a U+0001 sentinel (a control char that cannot survive inside
    * text tokens) and splitting on the sentinel — the inter-sentence
    * spaces are consumed, which is the intended normalization. Blank
    * fragments drop; `sentence_idx` numbers the KEPT sentences.
    * Output: `(idCol, sentence_idx, sentence, n_tokens)`.
    *
    * Scale shape: per-row split + posexplode — one map stage, no
    * shuffle, no UDF; fan-out is bounded by the doc's own sentence
    * count.
    */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sentinel = "\u0001"
    // raw crawled text can carry control chars — strip any pre-existing
    // sentinel first so it can't fabricate sentence boundaries
    val cleaned = regexp_replace(col(textCol), sentinel, "")
    val marked = regexp_replace(cleaned, "([.!?]) +", "$1" + sentinel)
    val kept = filter(split(marked, sentinel), s => trim(s) =!= "")
    df.select(col(idCol), posexplode(kept).as(Seq("sentence_idx", "sentence")))
      .select(col(idCol),
        col("sentence_idx").cast(LongType).as("sentence_idx"),
        col("sentence"),
        graft.functions.TextFunctions.tokenCount(col("sentence")).as("n_tokens"))
  }

  /** Deterministic balanced sharding — the data-loader prep step:
    * every doc gets a `shard` id so that consecutive docs IN THE
    * REPRODUCIBLE SHUFFLE ORDER (the
    * [[Sampling.deterministicShuffle]] total order: FNV(salt:key)
    * signed-ascending, then key) fill shards of ≈`budget` tokens —
    * `shard = tape_pos div budget`, where `tape_pos` is the exact
    * count of tokens preceding the doc on the conceptual tape. One
    * operator gives training-order randomization AND balanced output
    * files; re-running at any partitioning reproduces the same
    * layout, so shard manifests are stable artifacts.
    *
    * Scale shape — the same two-level prefix as the shuffle, carrying
    * token sums: rows bucket by the hash's high 10 bits (uniform by
    * construction), per-bucket token totals prefix-sum into bucket
    * offsets over ≤1024 histogram rows, and the within-bucket running
    * sum windows by bucket ordered by (hash, key) — no task ever
    * windows the whole corpus. Output adds `tape_pos` and `shard`
    * (both BIGINT, exact integer arithmetic).
    */
  def shardByTokenBudget(
      df: DataFrame,
      keyCol: String,
      tokensCol: Column,
      budget: Long,
      salt: String = "graft"
  ): DataFrame = {
    require(budget > 0, s"shardByTokenBudget: budget must be positive, got $budget")
    import org.apache.spark.sql.graft.ColumnBridge
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(
        concat(lit(salt + ":"), col(keyCol).cast("string")))))
    val withH = df
      .withColumn("_nt", tokensCol.cast(LongType))
      .withColumn("_h", h)
      .withColumn("_b", shiftright(col("_h"), 54) + lit(512L))
    val cnts = withH.groupBy("_b").agg(sum(col("_nt")).as("_ts"))
    val wOff = Window.orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("_toff", coalesce(sum(col("_ts")).over(wOff), lit(0L)))
      .select("_b", "_toff")
    val wRun = Window.partitionBy("_b").orderBy(col("_h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withH
      .withColumn("_prev", coalesce(sum(col("_nt")).over(wRun), lit(0L)))
      .join(offs, Seq("_b"))
      .withColumn("tape_pos", col("_toff") + col("_prev"))
      .withColumn("shard", expr(s"CAST(tape_pos div ${budget}L AS BIGINT)"))
      .drop("_h", "_b", "_prev", "_toff", "_nt")
  }
}
