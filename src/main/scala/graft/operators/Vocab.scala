package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.functions.TextFunctions

/**
 * Corpus vocabulary statistics — the lexical-coverage pass of
 * training-data curation: build the top-V term list once, then score
 * every document by how much of it the vocabulary covers. A high
 * out-of-vocabulary rate flags boilerplate-free gibberish, wrong-domain
 * text, and encoding damage the char-level heuristics miss; the vocab
 * itself feeds tokenizer training and stopword decisions.
 *
 * Tokenization is the library-wide whitespace rule
 * ([[TextFunctions.tokens]] over lowercased text) so vocab, BM25
 * postings, and quality scores all agree on what a "token" is.
 *
 * Scale shape: the vocabulary derives from the term HISTOGRAM (one
 * tokenize pass compressed by a map-side-combined count — terms cross
 * the wire counted once), and the top-V cut is a `TakeOrdered` (no
 * global sort materializes). Scoring is a second tokenize pass reduced
 * to per-doc `(id, term, tf)` rows joined against the BROADCAST vocab
 * (V is driver-bounded metadata) — the corpus text itself never
 * shuffles.
 */
object Vocab {

  /** Top-`v` terms by corpus frequency: `(term, cnt)`, ties at the
    * boundary broken by ascending term — a total, engine-reproducible
    * cut.
    */
  def topTerms(docs: DataFrame, textCol: String, v: Int): DataFrame = {
    require(v > 0, s"topTerms: v must be positive, got $v")
    docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(v)
  }

  /** Top-`k` terms by DOCUMENT frequency (the fraction-of-docs signal,
    * not raw occurrence count): `(term, df)`, ties at the boundary
    * broken by ascending term. This is language-agnostic stopword
    * DISCOVERY — the terms appearing in nearly every document are the
    * corpus's function words whatever its language mix, which feeds
    * [[graft.functions.TextFunctions.stopwordRatio]]-style quality
    * rules without a hand-curated list.
    *
    * Scale shape: one tokenize pass, per-doc distinct terms reduce
    * map-side into the (term, df) histogram, and the top-k cut is a
    * `TakeOrdered` — no global sort, terms cross the wire once.
    */
  def topDocFrequencyTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, s"topDocFrequencyTerms: k must be positive, got $k")
    docs
      .select(col(idCol).as("_id"),
        explode(array_distinct(TextFunctions.tokens(lower(col(textCol)))))
          .as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(k)
  }

  /** χ²-distinctive terms per group — the classical feature-selection
    * statistic (group-vs-rest 2×2 contingency per term), which unlike
    * the TF-IDF-flavored [[distinctiveTerms]] accounts for BOTH how
    * often a term appears in the group and how much of the corpus the
    * group is:
    *
    *   m = |a·d − b·c|
    *   r₁ = (N·m) div ((a+b)(c+d))
    *   χ²_e6(t, g) = (r₁·m·10⁶) div ((a+c)(b+d))
    *
    * over token-occurrence counts a (t in g), b (t elsewhere),
    * c (other tokens in g), d (other tokens elsewhere) — a STAGED
    * floor evaluation of N·m²·10⁶/den (single-stage would need ~10⁵⁰
    * intermediates): every operand is a non-negative integer, both
    * engines run the identical two floor divisions, and the stage
    * split keeps all products inside DECIMAL(38,0)/HUGEINT up to
    * N ≈ 3·10⁹ total tokens (ANSI-checked require; beyond that, run
    * per-shard and merge ranks — the stat is an ORDER, not an
    * accounting value).
    *
    * Scale shape: ONE map-side-combined (group, term) count aggregate;
    * everything after runs on ≤ |groups|·|vocab| aggregated rows, where
    * the per-group rank window is metadata-sized by construction.
    * Output: `(group, term, chi2_e6, rank)`, rank 1..k per group by
    * (χ² desc, term asc).
    */
  def chiSquareTerms(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int,
      minCount: Long = 1L
  ): DataFrame = {
    require(k > 0, s"chiSquareTerms: k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
    val gt = docs
      .select(col(groupCol).cast(StringType).as("group"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(col("group").isNotNull)
      .groupBy("group", "term").agg(count(lit(1)).as("a"))
    val tTot = gt.groupBy("term").agg(sum(col("a")).as("t_all"))
      .filter(col("t_all") >= minCount)
    val gTot = gt.groupBy("group").agg(sum(col("a")).as("g_all"))
    val nRow = gt.agg(sum(col("a")).as("n_all"))
    val n = nRow.head().getLong(0)
    require(n <= 3000000000L,
      s"chiSquareTerms: $n tokens exceeds the exact-χ² DECIMAL(38,0) bound " +
        "(~3e9) — shard and merge ranks, or sample")
    val scored = gt.join(tTot, Seq("term")).join(gTot, Seq("group"))
      .select(col("group"), col("term"), col("a"),
        (col("t_all") - col("a")).as("b"),
        (col("g_all") - col("a")).as("c"),
        (lit(n) - col("t_all") - col("g_all") + col("a")).as("d"))
      .withColumn("_m", expr(
        "abs(CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)"))
      .withColumn("_r1", expr(
        s"""(CAST($n AS DECIMAL(38,0)) * _m)
           | div (CAST((a + b) AS DECIMAL(38,0)) * (c + d))""".stripMargin))
      .withColumn("chi2_e6", expr(
        """CAST((CAST(_r1 AS DECIMAL(38,0)) * _m * 1000000)
          | div (CAST((a + c) AS DECIMAL(38,0)) * (b + d))
          | AS BIGINT)""".stripMargin))
      .withColumn("rank", row_number().over(
        w.partitionBy("group").orderBy(col("chi2_e6").desc, col("term"))).cast(IntegerType))
      .filter(col("rank") <= k)
    scored.select(col("group"), col("term"), col("chi2_e6"), col("rank"))
  }

  /** Top-`k` DISTINCTIVE terms per document — keyword extraction by
    * tf·(N/df), the transcendental-free tf-idf rank (N/df is the
    * idf's argument; `ln` is monotone, so ranking by tf·N/df equals
    * ranking by tf·exp(idf) — the keyword ORDER is what extraction
    * needs, calibrated idf values are not). Output: `(<idCol>, term,
    * score_e6, rank)` with score_e6 = HALF_UP₆(tf·N/df)×10⁶ as exact
    * BIGINT (the library's integer rounding kernel — ⌊(2a+d)/(2d)⌋
    * with a = tf·N·10⁶, d = df — so any engine reproduces both value
    * and order); rank 1-based by (score desc, term asc).
    *
    * Scale shape: one tokenize pass into map-side-combined `(id, term,
    * tf)` postings; per-term df joins AQE-broadcast when the
    * vocabulary fits; N rides a 1-row broadcast; the per-doc top-k cut
    * is the bounded `graft_bottomk` heap on (−score, term) — no
    * per-doc window or sort.
    */
  def distinctiveTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDf: Long = 1L
  ): DataFrame = {
    require(k > 0, s"distinctiveTerms: k must be positive, got $k")
    val tf = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // tf·N·10⁶ in long arithmetic: guarded by ANSI overflow past
    // ~10¹⁰·doc-length corpora — switch the kernel to DECIMAL(38,0)
    // if that bound is ever real
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score_e6",
        expr("(2 * tf * n_docs * 1000000 + df) div (2 * df)"))
    // score+term ride INSIDE the heap key (no post-hoc rejoin, which
    // would duplicate the postings lineage); ties on equal score break
    // to the ascending term via the struct's lexicographic order
    val packed = scored.select(col(idCol),
      struct(col("score_e6"), col("term")).as("_kt"),
      (-col("score_e6")).as("_neg"))
    Sampling.quotaPerGroup(packed, "_kt", idCol, "_neg", k,
        keepSmallest = true)
      .select(col(idCol), col("_kt.term").as("term"),
        col("_kt.score_e6").as("score_e6"), col("rank"))
  }

  /** Per-document vocabulary coverage against a (small, broadcast)
    * vocab table with a `term` column: `(idCol, n_tokens, n_oov,
    * oov_rate)`. `oov_rate = n_oov / n_tokens` is one IEEE division of
    * exact counts; a document with no tokens reports `(0, 0, null)` —
    * it has no defined rate, and null keeps it distinguishable from a
    * fully-covered doc.
    */
  def oovStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame
  ): DataFrame = {
    val tf = docs
      .select(col(idCol).as("_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("_id", "term").agg(count(lit(1)).as("_tf"))
    val marked = tf.join(
      broadcast(vocab.select(col("term"), lit(true).as("_in"))),
      Seq("term"), "left")
    val perDoc = marked.groupBy("_id").agg(
      sum(col("_tf")).as("_nt"),
      sum(when(col("_in").isNull, col("_tf")).otherwise(0L)).as("_no"))
    docs.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("_nt"), lit(0L)).cast(LongType).as("n_tokens"),
        coalesce(col("_no"), lit(0L)).cast(LongType).as("n_oov"),
        when(col("_nt") > 0L,
          col("_no").cast(DoubleType) / col("_nt").cast(DoubleType))
          .as("oov_rate"))
  }

  /** Adjacent-symbol-pair statistics — the counting step of one BPE
    * merge iteration (the public byte-pair-encoding tokenizer-training
    * algorithm) run at corpus scale: `(a, b, pair_count)`, the top `k`
    * pairs by (count desc, a, b), where `pair_count` weights each
    * distinct word's character pairs by the word's corpus frequency.
    * The winning pair is the next merge a BPE trainer would apply.
    *
    * Scale shape — the classic BPE compression, distributed: the
    * corpus first reduces to its distinct-WORD histogram (one tokenize
    * pass, map-side-combined counts — distinct words ≪ corpus tokens,
    * so this is the only stage that touches every token), then the
    * character-pair explosion runs over the histogram rows only and
    * re-aggregates into the pair histogram. The final cut is a
    * `TakeOrdered` bounded heap, never a global sort. Tokenization is
    * the library-wide whitespace rule over lowercased text; pair
    * extraction is `substr` character arithmetic both Spark and any
    * oracle engine define identically.
    */
  def bpePairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"bpePairStats: k must be positive, got $k")
    pairStatsOfWords(wordHistogram(docs, textCol), k)
  }

  /** One APPLIED BPE merge round — the loop-closing companion of
    * [[bpePairStats]] (which only counts): take the winning pair
    * (count desc, then (a, b) — the total order both engines agree
    * on), merge every leftmost-nonoverlapping occurrence inside every
    * distinct word, and return the NEXT round's pair statistics, with
    * the merged symbol spelled out (so the pair ("t", "he") can win
    * round 2). This is exactly one iteration of the public BPE
    * trainer, distributed.
    *
    * Implementation note: the merge applies as a plain substring
    * `replace(w, a||b, <sentinel>)` over the word histogram — both
    * Spark and DuckDB's `replace` substitute leftmost-nonoverlapping
    * occurrences left to right, which IS the BPE tie rule — with a
    * U+0001 sentinel standing for the merged symbol during the
    * re-count (corpus tokens are whitespace-split text; a U+0001
    * control char cannot survive tokenization as part of a word, so
    * the sentinel is collision-free). The winning pair is ONE
    * driver-side `head()` on the k=1 stats — metadata scale, like the
    * samplers' count pre-passes.
    */
  def bpeNextPairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"bpeNextPairStats: k must be positive, got $k")
    val words = wordHistogram(docs, textCol)
    val top = pairStatsOfWords(words, 1).head()
    val (a, b) = (top.getString(0), top.getString(1))
    val mergedSym = a + b
    val sentinel = "\u0001"
    val w2 = words.select(
      replace(col("w"), lit(a + b), lit(sentinel)).as("w"), col("wc"))
    val sym = (c: Column) =>
      when(c === sentinel, lit(mergedSym)).otherwise(c)
    w2.filter(length(col("w")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, char_length(w) - 1), " +
          "i -> struct(substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b))"))
        .as("p"))
      .groupBy(sym(col("p.a")).as("a"), sym(col("p.b")).as("b"))
      .agg(sum(col("wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Vocabulary coverage curve — for each requested vocabulary size
    * `k`, the fraction of ALL token occurrences covered by the k most
    * frequent terms (count desc, term asc: a total order) — the
    * tokenizer-sizing analysis ("how large a vocab covers 95% of the
    * corpus"). Output: `(k, covered_tokens, total_tokens, coverage_ppm
    * BIGINT)`, coverage_ppm = covered·10⁶ div max(total, 1).
    *
    * Scale shape: the only corpus-scale stage is the map-side-combined
    * term histogram (the [[topTerms]] shuffle); the top-max(k) cut is a
    * TakeOrdered bounded heap — no global sort — and the rank window
    * runs over those ≤ max(k) driver-bounded rows only; the grand
    * total is a 1-row aggregate of histogram rows.
    */
  def coverageCurve(docs: DataFrame, textCol: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      s"coverageCurve: ks must be positive, got $ks")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = wordHistogram(docs, textCol)
    val total = Option(hist.agg(sum(col("wc"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val maxK = ks.max
    val top = hist.orderBy(col("wc").desc, col("w")).limit(maxK)
      .withColumn("_r",
        row_number().over(Window.orderBy(col("wc").desc, col("w"))).cast("long"))
    ks.distinct.sorted.map(_.toLong).toDF("k")
      .join(top, col("_r") <= col("k"), "left")
      .groupBy("k").agg(coalesce(sum(col("wc")), lit(0L)).as("covered_tokens"))
      .select(col("k"), col("covered_tokens"),
        lit(total).as("total_tokens"),
        expr(s"CAST(covered_tokens * 1000000 div ${math.max(total, 1L)}L AS BIGINT)")
          .as("coverage_ppm"))
  }

  /** Vocabulary GROWTH curve — distinct-term count after each corpus
    * prefix (crawl order by `idCol`): the Heaps-law diagnostic of a
    * training mix. A healthy diverse corpus keeps discovering terms
    * (sublinear but unbounded growth); a curve that flattens early
    * says the tail is re-crawls and boilerplate — the corpus-level
    * complement of the per-doc [[ngramNovelty]] signal. Checkpoints
    * are id thresholds (`prefix` = docs with id < c); output one row
    * per checkpoint: `(prefix_lt, distinct_terms, total_tokens)` —
    * both counts exact.
    *
    * Scale shape: ONE tokenize pass and ZERO joins, whatever the
    * checkpoint count — each term reduces to its FIRST-SEEN id
    * (map-side-combined `min`), the first-seen id folds to its
    * checkpoint-INTERVAL index against the sorted checkpoint literals
    * (a bounded per-row `aggregate`, no join), the interval histogram
    * (≤ |checkpoints|+1 rows) collects as driver metadata, and each
    * checkpoint's count is a driver prefix sum emitted as literals;
    * token totals ride the identical shape over per-doc counts. The
    * naive K-pass `countDistinct` per prefix never happens, and no
    * BroadcastNestedLoop theta join appears in the plan.
    */
  def vocabGrowthCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      checkpoints: Seq[Long]
  ): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ > 0),
      s"vocabGrowthCurve: checkpoints must be positive, got $checkpoints")
    val spark = docs.sparkSession
    import spark.implicits._
    val cps = checkpoints.distinct.sorted
    val cpArr = lit(cps.toArray)
    // interval index of a value v = #{checkpoints <= v}; v < cps(i) ⟺ idx <= i
    def intervalIdx(v: Column): Column = aggregate(cpArr, lit(0L),
      (acc, c) => acc + when(v >= c, 1L).otherwise(0L))
    val toks = docs
      .select(col(idCol).cast(LongType).as("_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("_t"))
      .filter(col("_id").isNotNull)
    def cumByInterval(perInterval: DataFrame): Seq[Long] = {
      val m = perInterval.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cps.indices.map(i => (0 to i).map(k => m.getOrElse(k.toLong, 0L)).sum)
    }
    val termCum = cumByInterval(
      toks.groupBy(col("_t")).agg(min(col("_id")).as("_fs"))
        .groupBy(intervalIdx(col("_fs")).as("_iv"))
        .agg(count(lit(1)).as("_c")))
    val tokenCum = cumByInterval(
      toks.select(intervalIdx(col("_id")).as("_iv"))
        .groupBy(col("_iv")).agg(count(lit(1)).as("_c")))
    cps.indices.map(i => (cps(i), termCum(i), tokenCum(i)))
      .toDF("prefix_lt", "distinct_terms", "total_tokens")
  }

  /** N-gram NOVELTY per document — what fraction of a doc's distinct
    * word n-grams appear in NO earlier doc (crawl order by `idCol`):
    * the "new information rate" curation signal. A re-crawl or
    * boilerplate page scores near zero; fresh content scores high —
    * the streaming-order complement of the pairwise dedup detectors.
    * Output: `(idCol, novel_ngrams, total_ngrams, novelty_ppm)` with
    * `novelty_ppm = novel·10⁶ div max(total, 1)` (exact integers).
    * Shingling is the library-wide normalized word-n-gram rule
    * ([[graft.functions.TextFunctions.shingles]] — docs shorter than
    * `n` tokens contribute their whole token run as one shingle).
    *
    * Scale shape: distinct shingles explode as 8-byte xxhash64
    * fingerprints (ids+hashes shuffle, never text — the dedup-family
    * convention, collision-tolerant by the same 2⁻⁶⁴ argument); the
    * first-seen table is one map-side-combined `min` per fingerprint,
    * and the join back rides the same fingerprint exchange.
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"ngramNovelty: n must be positive, got $n")
    // keep the id's ORIGINAL type: first-seen `min` is defined on
    // strings too, and a silent long cast would collapse non-numeric
    // ids into one null group
    val g = docs.select(col(idCol).as("_id"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("_s"))
      .select(col("_id"), xxhash64(col("_s")).as("_fp"))
    val firsts = g.groupBy("_fp").agg(min(col("_id")).as("_first"))
    g.join(firsts, Seq("_fp"))
      .groupBy(col("_id"))
      .agg(
        sum(when(col("_first") === col("_id"), 1L).otherwise(0L)).as("novel_ngrams"),
        count(lit(1)).as("total_ngrams"))
      .select(col("_id").as(idCol), col("novel_ngrams"), col("total_ngrams"),
        expr("CAST(novel_ngrams * 1000000 div greatest(total_ngrams, 1L) AS BIGINT)")
          .as("novelty_ppm"))
  }

  /** Distinct-n corpus diversity per group — the distinct-1/distinct-2
    * generation-diversity metric (Li et al. 2016, "A Diversity-Promoting
    * Objective Function for Neural Conversation Models") applied to
    * corpus curation: per group (source), the fraction of n-gram
    * INSTANCES that are distinct. A templated or boilerplate-heavy
    * source scores low; diverse prose scores high — the corpus-level
    * complement of the per-doc repetition signals. One row per
    * (group, n): `(<group>, n, distinct_ngrams, total_ngrams,
    * distinct_ppm)` with `distinct_ppm = distinct·10⁶ div
    * max(total, 1)` (exact integers).
    *
    * Shingling is the library-wide normalized word-n-gram rule
    * ([[graft.functions.TextFunctions.shingles]]); distinct counting
    * rides 8-byte xxhash64 fingerprints (the [[ngramNovelty]]
    * collision-tolerance argument).
    *
    * Scale shape: one tokenize+shingle pass per requested n; the
    * exchange carries (group, fp, partial count) — map-side combine
    * collapses each partition's repeats before the shuffle, and the
    * second aggregate is per-group metadata. Text never shuffles.
    */
  def distinctNgramRatio(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      ns: Seq[Int]
  ): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"distinctNgramRatio: ns must be positive, got $ns")
    require(ns.distinct == ns, s"distinctNgramRatio: duplicate n in $ns")
    ns.map { n =>
      docs
        .select(col(groupCol).cast("string").as("_g"),
          explode(TextFunctions.shingles(col(textCol), n)).as("_s"))
        .select(col("_g"), xxhash64(col("_s")).as("_fp"))
        .groupBy(col("_g"), col("_fp"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("_g"))
        .agg(sum(col("_c")).as("total_ngrams"),
          count(lit(1)).as("distinct_ngrams"))
        .select(col("_g").as(groupCol), lit(n.toLong).as("n"),
          col("distinct_ngrams"), col("total_ngrams"),
          expr("CAST(distinct_ngrams * 1000000 div greatest(total_ngrams, 1L) AS BIGINT)")
            .as("distinct_ppm"))
    }.reduce(_ unionByName _)
  }

  private def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))

  private def pairStatsOfWords(words: DataFrame, k: Int): DataFrame =
    words
      .filter(length(col("w")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, char_length(w) - 1), " +
          "i -> struct(substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(k)
}
