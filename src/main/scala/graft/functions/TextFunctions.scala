package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis primitives for large-scale training-data pipelines:
 * token counting, quality scoring, language-ID heuristic, document
 * fingerprinting. All pure built-in-expression columns (codegen'd,
 * narrow, no UDFs) so a 100 TB corpus pass is a single map stage with
 * full predicate pushdown upstream.
 */
object TextFunctions {

  /** Whitespace tokens: the maximal non-`\s` runs, empty/blank text →
    * empty array. A native single-pass codegen'd expression
    * (graft.plans.WhitespaceTokens) — no per-row regex; equivalence with
    * `filter(split(trim(text), "\s+"), _ != "")` is spec-pinned.
    */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.WhitespaceTokens(ColumnBridge.expression(text)))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** CJK-robust token count (graft.plans.CjkTokenCount): whitespace runs
    * count once, each CJK codepoint counts individually — the public
    * Gopher/C4 practice for non-space-delimited languages, where plain
    * whitespace counting scores an unsegmented paragraph as ~1 token and
    * silently misgrades every length-based quality rule. Equal to
    * [[tokenCount]] on CJK-free text (spec-pinned); use it wherever a
    * token count feeds a filter over a multilingual mix.
    */
  def tokenCountCjk(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.CjkTokenCount(ColumnBridge.expression(text)))
  }

  /** BPE-ish subword count: alphanumeric runs + individual non-space
    * symbols — the coarse shape of a GPT-2-style pre-tokenizer, kept
    * RE2-compatible (no lookarounds) so oracles can reproduce it.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Vocabulary-driven subword token count (WordPiece greedy
    * longest-match; `##`-prefixed vocab entries are continuation
    * pieces, unmatched positions fall back to one token per codepoint)
    * — the counter to budget packing/batching/truncation in when the
    * training tokenizer's vocab is available. Native single-pass
    * expression (graft.plans.SubwordCount); deterministic integer and
    * string work only, so oracles replay it exactly.
    */
  def tokenCountSubword(text: Column, vocab: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.SubwordCount(ColumnBridge.expression(text), vocab))
  }

  /** Total (position, pattern) substring matches — overlaps and nested
    * patterns all count — via a single Aho–Corasick pass
    * (graft.plans.MultiPatternCount): O(text) per row regardless of the
    * pattern-list size, vs O(patterns × text) for per-pattern scans.
    * Case-sensitive; lowercase upstream when needed.
    */
  def multiPatternHits(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.MultiPatternCount(ColumnBridge.expression(text), patterns,
        distinctMode = false))
  }

  /** Number of DISTINCT patterns occurring at least once ("how many
    * blocklist rules fired") — same single Aho–Corasick pass as
    * [[multiPatternHits]].
    */
  def multiPatternDistinct(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.MultiPatternCount(ColumnBridge.expression(text), patterns,
        distinctMode = true))
  }

  /** Homoglyph-canonical skeleton (graft.plans.ConfusableSkeleton): a
    * fixed TR39-subset mapping of Cyrillic/Greek Latin-lookalikes +
    * fullwidth forms, zero-width chars stripped — run BEFORE byte-level
    * fingerprints so spoofed copies dedup against their sources.
    */
  def confusableSkeleton(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.ConfusableSkeleton(ColumnBridge.expression(text)))
  }

  /** Unigram-LM Viterbi segmentation stats `[cost, n_tokens]` for ONE
    * word under integer piece costs (graft.plans.UnigramSegmentWord) —
    * the SentencePiece-unigram inference rule, globally cheapest
    * segmentation rather than WordPiece's greedy longest match.
    */
  def unigramSegmentStats(
      word: Column,
      pieces: Seq[(String, Long)],
      unkCost: Long,
      maxWordLen: Int = 15
  ): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.UnigramSegmentWord(
      ColumnBridge.expression(word), pieces, unkCost, maxWordLen))
  }

  def charCount(text: Column): Column = length(text).cast(LongType)

  /** Ratio of punctuation chars to total chars; null-safe, 0 for empty.
    * The numerator is the native single-pass graft.plans.PunctCount
    * (equivalent to counting what `regexp_replace(text, "[^\p{Punct}]",
    * "")` leaves behind).
    */
  def punctRatio(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val punct = ColumnBridge.column(
      graft.plans.PunctCount(ColumnBridge.expression(text)))
    when(length(text) > 0, punct.cast(DoubleType) / length(text).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Mean token length — a cheap fluency proxy. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) /
        size(ts).cast(DoubleType)
    ).otherwise(lit(0.0))
  }

  /** Default English stopword set for the ratio feature (public list). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was", "from"
  )

  /** Hit counts for N marker sets in one token walk — the native
    * graft.plans.MarkerCounts expression (ARRAY<INT>, element i = tokens
    * contained in sets(i)). The composed `size(filter(ts, isin(...)))`
    * form is an interpreted HOF with no codegen/CSE, re-walking the token
    * array once per set.
    */
  def markerCounts(tokensCol: Column, sets: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.MarkerCounts(ColumnBridge.expression(tokensCol), sets))
  }

  /** Fraction of tokens that are stopwords (lowercased exact match). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Stopwords): Column = {
    val ts = tokens(lower(text))
    val sw = element_at(markerCounts(ts, Seq(stopwords)), 1)
    when(size(ts) > 0, sw.cast(DoubleType) / size(ts).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with a
    * healthy stopword ratio and low punctuation density. Weights are a
    * deterministic, documented heuristic (pipeline filter, not a model).
    *
    * `cjkAware` routes the length rule through [[tokenCountCjk]] AND
    * drops the stopword component entirely (weights renormalize to
    * len 0.6 / punct 0.4): the stopword list is English-marker-based, so
    * keeping it would score every unsegmented CJK doc 0 on that component
    * — re-penalizing exactly the documents the flag rescues.
    */
  def qualityScore(text: Column, cjkAware: Boolean = false): Column = {
    val n = if (cjkAware) tokenCountCjk(text) else tokenCount(text)
    val lenOk = when(n.between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.0))
    if (cjkAware) round(lenOk * 0.6 + punctOk * 0.4, 2)
    else {
      val sw = stopwordRatio(text)
      val swOk = when(sw.between(0.01, 0.8), lit(1.0)).otherwise(lit(0.0))
      round(lenOk * 0.4 + swOk * 0.4 + punctOk * 0.2, 2)
    }
  }

  // ------------------------------------------------ repetition signals
  // The public Gopher/MassiveText & RefinedWeb pipelines filter documents
  // by internal repetition; these are the two core signals, computed
  // narrowly per row (no shuffle, native one-pass primitives).

  /** Fraction of lines that are duplicates of another line:
    * (n_lines − n_distinct_lines) / n_lines; 0 for empty/blank input.
    * Lines are '\n'-separated verbatim (no trimming), so reproducible by
    * any engine's string_split.
    */
  def duplicateLineFraction(text: Column): Column = {
    val lines = split(text, "\n", -1)
    val n = size(lines)
    when(n > 0,
      (n - size(array_distinct(lines))).cast(DoubleType) / n.cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Remove duplicate lines WITHIN a document, keeping each line's first
    * occurrence in order — the transform twin of
    * [[duplicateLineFraction]] (that one measures, this one repairs; the
    * cross-corpus variant is `Dedup.boilerplateLines`). Lines are
    * '\n'-separated verbatim (no trimming), so any engine's string_split
    * reproduces the result. Narrow per-row work, no shuffle.
    *
    * Implementation folds the line array once, appending each line not
    * yet seen — a single `aggregate` pass over ONE split evaluation
    * (a filter-by-first-index form re-evaluates the split inside the
    * interpreted lambda per element). O(L²) line comparisons per doc in
    * line count L, which is the right trade below ~10⁴ lines; docs
    * beyond that should be exploded and reduced instead.
    */
  def dedupLinesInDoc(text: Column): Column = {
    val lines = split(text, "\n", -1)
    val deduped = aggregate(
      lines,
      array().cast(ArrayType(StringType)),
      (acc, x) => when(array_contains(acc, x), acc).otherwise(concat(acc, array(x))))
    array_join(deduped, "\n")
  }

  /** The surviving lines of the C4 line-level cleaning recipe (the
    * public C4 rules: a line is kept iff it carries at least
    * `minWordsPerLine` whitespace tokens AND — after right-trimming
    * spaces — ends in a terminal punctuation mark `. ! ?` or `"`).
    * Lines are '\n'-separated verbatim. Pure string work on built-in
    * expressions (narrow, no shuffle), reproducible by any engine's
    * string_split + regex.
    */
  def c4KeptLines(text: Column, minWordsPerLine: Int = 3): Column = {
    require(minWordsPerLine >= 0,
      s"c4KeptLines: minWordsPerLine must be >= 0, got $minWordsPerLine")
    filter(split(text, "\n", -1), l =>
      (size(tokens(l)) >= minWordsPerLine) && rtrim(l).rlike("[.!?\"]$"))
  }

  /** The C4 document-level gate composed over [[c4KeptLines]]: a doc
    * passes iff its ORIGINAL text contains neither "lorem ipsum"
    * (case-insensitive) nor a curly brace, and at least `minKeptLines`
    * lines survive the line filter. The page-drop half of the C4
    * recipe — apply it to the same `keptLines` array the clean text is
    * rebuilt from, so the two halves never re-split.
    */
  def c4DocPass(text: Column, keptLines: Column, minKeptLines: Int = 1): Column =
    !lower(text).contains("lorem ipsum") &&
      !text.contains("{") &&
      (size(keptLines) >= minKeptLines)

  /** Sentence count: maximal runs of non-terminal characters closed by
    * a run of terminal punctuation (`. ! ?`) — text after the last
    * terminal mark doesn't count, matching the C4 recipe's
    * sentence-per-page rule (pages need ≥ N sentences). One RE2-safe
    * regex (no lookaround), reproducible by any engine's
    * regexp_extract_all.
    */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^.!?]*[.!?]+"), lit(0)))
      .cast(LongType)

  /** True iff any whitespace token of the lowercased text equals a
    * blocked term — the C4 "bad words" page filter (list-driven policy
    * drop). Exact token match, not substring: "class" must not trip a
    * block on "ass". The list is policy metadata (a literal array in
    * the plan); lowercase it once here.
    */
  def hasBlockedWord(text: Column, blocked: Seq[String]): Column =
    arrays_overlap(tokens(lower(text)),
      array(blocked.map(b => lit(b.toLowerCase(java.util.Locale.ROOT))): _*))

  /** Truncate to the first `maxTokens` whitespace tokens, re-joined with
    * single spaces — the max-sequence-length clamp of training prep.
    * NOTE: re-joining NORMALIZES whitespace (runs collapse to one
    * space); token content and order are preserved exactly. Narrow,
    * no shuffle; empty/blank text stays "".
    */
  def truncateToTokens(text: Column, maxTokens: Int): Column = {
    require(maxTokens > 0, s"truncateToTokens: maxTokens must be positive, got $maxTokens")
    array_join(slice(tokens(text), 1, maxTokens), " ")
  }

  /** Multiplicity of the most frequent whitespace token of the lowercased
    * text — the native one-pass graft.plans.TopTokenFreq. 0 for empty.
    */
  def maxTokenFreq(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.TopTokenFreq(ColumnBridge.expression(tokens(lower(text)))))
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * "most common word" dominance ratio; 0 for empty.
    */
  def topTokenRatio(text: Column): Column = {
    val ts = tokens(lower(text))
    when(size(ts) > 0,
      maxTokenFreq(text).cast(DoubleType) / size(ts).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Fraction of word n-grams taken by the most frequent n-gram (the
    * Gopher top-2-gram/3-gram rule shape); 0 when fewer than n tokens
    * (a doc too short to have an n-gram is not "repetitive").
    */
  def topNgramRatio(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val ts = tokens(lower(text))
    val sh = shinglesFromTokens(ts, n)
    val top = ColumnBridge.column(
      graft.plans.TopTokenFreq(ColumnBridge.expression(sh)))
    when(size(ts) >= n, top.cast(DoubleType) / size(sh).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  // ------------------------------------------- Gopher structural rules
  // The four structural document filters published in the Gopher/
  // MassiveText appendix (symbol-to-word ratio, bullet lines, ellipsis
  // lines, alpha-word ratio). All narrow codegen'd builtins; patterns
  // kept RE2-compatible so oracles reproduce the exact counts.

  /** (#'#' chars + #'...' occurrences) / words — the Gopher symbol-to-
    * word ratio (docs over 0.1 are filtered). Ellipsis occurrences are
    * counted non-overlapping via replace-length arithmetic.
    */
  def symbolToWordRatio(text: Column, cjkAware: Boolean = false): Column = {
    val hashes = (length(text) - length(replace(text, lit("#"), lit("")))).cast(DoubleType)
    val ellipses =
      (length(text) - length(replace(text, lit("..."), lit("")))).cast(DoubleType) / 3.0
    val n = if (cjkAware) tokenCountCjk(text) else tokenCount(text)
    when(n > 0, (hashes + ellipses) / n.cast(DoubleType)).otherwise(lit(0.0))
  }

  /** Fraction of lines starting (after indent) with a bullet marker. */
  def bulletLineFraction(text: Column): Column = {
    val n = size(split(text, "\n", -1))
    val bullets = size(regexp_extract_all(text, lit("(?m)^[ \\t]*[-*\u2022]"), lit(0)))
    when(n > 0, bullets.cast(DoubleType) / n.cast(DoubleType)).otherwise(lit(0.0))
  }

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineFraction(text: Column): Column = {
    val n = size(split(text, "\n", -1))
    val ell = size(regexp_extract_all(text, lit("(?m)(\\.\\.\\.|\u2026)[ \\t]*$"), lit(0)))
    when(n > 0, ell.cast(DoubleType) / n.cast(DoubleType)).otherwise(lit(0.0))
  }

  /** The CJK codepoint class of graft.plans.CjkTokenCount, as a Java/
    * RE2-compatible character-class body (no \p{Han} — explicit ranges
    * keep the rule reproducible across engines).
    */
  private val CjkClass =
    "\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}" +
      "\\x{AC00}-\\x{D7AF}\\x{F900}-\\x{FAFF}\\x{20000}-\\x{2FFFF}"

  /** Fraction of words containing at least one ASCII letter (Gopher
    * removes docs under 0.8). `cjkAware`: words segment per
    * [[tokenCountCjk]] (each CJK codepoint is its own word) and every
    * CJK codepoint counts as alphabetic — without this an unsegmented
    * Chinese paragraph scores ~0 and the alpha rule silently removes
    * the language from the mix.
    */
  def alphaWordRatio(text: Column, cjkAware: Boolean = false): Column = {
    if (!cjkAware) {
      val n = tokenCount(text)
      val alpha = size(regexp_extract_all(text, lit("\\S*[A-Za-z]\\S*"), lit(0)))
      when(n > 0, alpha.cast(DoubleType) / n.cast(DoubleType)).otherwise(lit(0.0))
    } else {
      val n = tokenCountCjk(text)
      // alpha tokens under CJK segmentation: CJK codepoints (each its own
      // word, all alphabetic) + non-ws non-CJK runs containing a letter
      val alpha =
        size(regexp_extract_all(text, lit(s"[$CjkClass]"), lit(0))) +
          size(regexp_extract_all(text,
            lit(s"[^\\s$CjkClass]*[A-Za-z][^\\s$CjkClass]*"), lit(0)))
      when(n > 0, alpha.cast(DoubleType) / n.cast(DoubleType)).otherwise(lit(0.0))
    }
  }

  /** The conjunction of the four structural rules at the published
    * thresholds — true = keep. `cjkAware` routes the word-based rules
    * through the CJK-robust counter (the line-based rules are
    * script-independent already).
    */
  def gopherStructuralPass(text: Column, cjkAware: Boolean = false): Column =
    symbolToWordRatio(text, cjkAware) <= 0.1 &&
      bulletLineFraction(text) <= 0.9 &&
      ellipsisLineFraction(text) <= 0.3 &&
      alphaWordRatio(text, cjkAware) >= 0.8

  /** Language-ID marker words: a tiny deterministic n-gram/stopword
    * heuristic (public fastText-style idea reduced to marker tokens).
    * Returns the language whose marker-hit count is highest; ties and
    * zero hits → "und".
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist")
  )

  def langId(text: Column): Column = {
    // all four marker sets counted in ONE native token walk; the repeated
    // element_at references below share the MarkerCounts subtree via
    // whole-stage-codegen subexpression elimination (everything here is
    // codegen'd — the previous interpreted HOF filters were not CSE-able)
    val counts = markerCounts(tokens(lower(text)), LangMarkers.map(_._2))
    val scores = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language reaching the max wins (deterministic order)
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s > 0 && s === best, lit(lang)).otherwise(els)
    }
  }

  /** Per-document language PURITY: classify every non-blank LINE with
    * [[langId]], return one row per doc with the majority line language
    * and `purity` = majority-line count / classified lines — the
    * mixed-language-document signal (a doc-level [[langId]] can't see
    * that a "mostly English" page carries a third of its lines in
    * another language; concatenated boilerplate and bilingual pages
    * both surface here). Docs with no non-blank lines are absent from
    * the output (nothing to classify).
    *
    * Shape: explode to lines (the only fan-out; line classification is
    * the same one-pass codegen'd marker walk), reduce to per-(doc,
    * lang) counts with map-side combine — at most |langs|+1 rows per
    * doc cross the wire — then one heap argmax per doc. Ties break toward
    * the lexicographically LARGER language code ((cnt, lang) struct
    * max), deterministic and engine-reproducible; purity is one
    * fixed-order long→double division.
    */
  def langPurity(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame = {
    graft.plans.TopKAggregate.register(df.sparkSession)
    val perLine = df
      .select(col(idCol), explode(split(col(textCol), "\n", -1)).as("_line"))
      .filter(trim(col("_line")) =!= "")
      .select(col(idCol), langId(col("_line")).as("_ll"))
    perLine.groupBy(col(idCol), col("_ll"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(idCol))
      .agg(
        // k=1 heap argmax (the snapshotAt convention): a max(struct)
        // with a string field has an immutable buffer and falls back to
        // SortAggregate; the typed heap keeps an ObjectHashAggregate
        element_at(call_function("graft_topk",
          struct(col("_cnt"), col("_ll")), lit(1)), 1).as("_m"),
        sum(col("_cnt")).as("_total"))
      .select(
        col(idCol),
        col("_m._ll").as("majority_lang"),
        (col("_m._cnt").cast(DoubleType) / col("_total").cast(DoubleType))
          .as("purity"))
  }

  /** Script-aware language ID: CJK scripts are decided by CODEPOINT
    * CLASS (marker words can't see a language whose words aren't
    * space-delimited — [[langId]] scores every CJK doc "und"), then
    * non-CJK text falls through to the marker heuristic. Rules, on
    * fractions of non-whitespace codepoints (all counts are explicit
    * codepoint-range regex counts, so an oracle reproduces them):
    *  - kana present (> 5%) and Han+kana ≥ 30% → "ja" (kana is unique
    *    to Japanese; Japanese prose mixes kanji with kana);
    *  - Hangul ≥ 30% → "ko";
    *  - Han ≥ 30% → "zh" (no kana, majority ideographs);
    *  - otherwise → [[langId]].
    */
  def langIdWithScript(text: Column): Column = {
    // one native byte walk (graft.plans.ScriptCounts) yields all four
    // counts; the repeated element_at references share the subtree via
    // whole-stage-codegen CSE — this replaced 4 full-text
    // regexp_extract_all passes per row (bench: 2.3× plain langId)
    import org.apache.spark.sql.graft.ColumnBridge
    val counts = ColumnBridge.column(
      graft.plans.ScriptCounts(ColumnBridge.expression(text)))
    def c(i: Int) = element_at(counts, i).cast(DoubleType)
    val nonWs = c(1)
    val han = c(2)
    val kana = c(3)
    val hangul = c(4)
    when(nonWs > 0 && kana / nonWs > 0.05 && (han + kana) / nonWs >= 0.3, lit("ja"))
      .when(nonWs > 0 && hangul / nonWs >= 0.3, lit("ko"))
      .when(nonWs > 0 && han / nonWs >= 0.3, lit("zh"))
      .otherwise(langId(text))
  }

  /** Corpus-level token frequency table — the canonical wordcount, the
    * raw material for stopword discovery and Zipf diagnostics. One
    * explode + map-side-combined hash aggregate; `topN` with a
    * lexicographic tie-break so the cut is deterministic.
    */
  def tokenFrequencies(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      topN: Int
  ): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topN)

  /** 64-bit FNV-1a over the UTF-8 bytes of the normalized text — a
    * deterministic rolling document fingerprint (public FNV constants).
    * Built from xxhash64 would be cheaper, but FNV is trivially
    * reproducible in any oracle; we expose both.
    */
  def fingerprintXx(text: Column, seed: Int = 42): Column =
    xxhash64(normalizeForFingerprint(text))

  /** Normalization for fingerprinting: lowercase, strip punctuation,
    * collapse whitespace — so near-identical docs collide. A native
    * single-pass codegen'd expression (graft.plans.NormalizeText): this
    * chain heads every text pipeline, so its per-row cost IS the 100 TB
    * map-stage cost; one byte scan replaces four string passes + a regex.
    */
  def normalizeForFingerprint(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.NormalizeText(ColumnBridge.expression(text)))
  }

  // -------------------------------------------------- PII redaction
  // Public-pipeline hygiene (the C4/RefinedWeb preprocessing family):
  // replace well-formed PII spans before training. Patterns are kept
  // RE2-compatible (no lookarounds, no backreferences) so external
  // engines and oracles can reproduce the exact spans.

  /** Email addresses (pragmatic RFC-lite pattern). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone numbers: optional +1, separators -,., or
    * space, e.g. 555-123-4567 / (555) 123 4567.
    */
  val PhonePattern = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /** IPv4 literals (dotted quads; no range validation — redaction leans
    * conservative).
    */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Default redaction table: pattern → replacement token. */
  val DefaultRedactions: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    PhonePattern -> "[PHONE]",
    Ipv4Pattern -> "[IP]"
  )

  /** Replace each pattern with its token, applied in order (earlier
    * patterns win on overlapping spans). Narrow, codegen'd
    * regexp_replace chain — one map stage at any scale.
    */
  def redact(text: Column, redactions: Seq[(String, String)] = DefaultRedactions): Column =
    redactions.foldLeft(text) { case (t, (pat, repl)) =>
      regexp_replace(t, pat, repl)
    }

  /** Count of matches of one pattern (audit/reporting side of redaction). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast(LongType)

  /** Word n-grams (shingles) of the normalized text, for MinHash/Jaccard.
    *
    * NOTE for hot paths: higher-order functions are interpreted (no
    * codegen/CSE), so pass a *materialized* token column via
    * `shinglesFromTokens` when the shingles feed many downstream
    * expressions — inlining this tree N times recomputes the regex
    * normalization N times per row.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(normalizeForFingerprint(text)), n)

  /** Shingles from an already-computed token array column. A native
    * single-pass codegen'd expression (graft.plans.WordShingles) — the
    * composed transform/slice/concat_ws HOF chain is interpreted and this
    * feeds the explode at every shingle-dedup head.
    */
  def shinglesFromTokens(ts: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.WordShingles(ColumnBridge.expression(ts), n))
  }

  /** Character n-grams of the normalized text. A native single-pass
    * expression (graft.plans.CharShingles): the composed
    * transform/sequence/substr chain was interpreted AND quadratic —
    * char-indexed `substr` re-scans from the string head per shingle.
    */
  /** Unicode NFC canonical-composition normalization (native
    * graft.plans.NfcNormalize) — run it ahead of any dedup/fingerprint
    * pass on multilingual text: decomposed "e +  ́" and precomposed "é"
    * hash differently but read identically. Near-free on clean data
    * (isNormalized short-circuits).
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.NfcNormalize(ColumnBridge.expression(text)))
  }

  def charShingles(text: Column, n: Int, stride: Int = 1): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.CharShingles(
      ColumnBridge.expression(normalizeForFingerprint(text)), n, stride))
  }

  /** BPE ENCODE token count — apply a learned merge list to every word
    * and count the resulting subword symbols. This is the serving-side
    * companion of the trainer loop ([[graft.operators.Vocab.bpePairStats]]
    * learns the next merge; this applies a frozen ranked list): each
    * word is spelled as space-separated symbols ("hello" → "h e l l o")
    * and the merges run IN RANK ORDER, each as one global
    * leftmost-nonoverlapping `replace("a b" → "ab")` — the same
    * substitution rule the trainer uses
    * ([[graft.operators.Vocab.bpeNextPairStats]]), so encode and learn
    * share one tie-break. The symbol count per word is then
    * spaces + 1, summed over the doc.
    *
    * Rank-order global application is the documented semantics (one
    * pass per merge); the classical re-scan-for-lowest-rank encoder
    * can differ only when a LATER-rank merge creates an occurrence of
    * an EARLIER-rank pair — we define the operator without that
    * back-edge so both engines replay it with plain `replace` chains.
    *
    * Scale shape: per-row native kernel (graft.plans.BpeEncodeCount) —
    * no shuffle, no UDF, no state; the merge list rides the expression
    * (the SubwordCount pattern) with a per-rank 64-bit char bloom so a
    * production 32k-merge vocabulary costs O(merges) bit-tests per
    * word, not 32k chained `replace` allocations — and stays inside
    * whole-stage codegen where the 32k-deep replace tree could not.
    * Parity with the reference replace-chain composition
    * ([[bpeTokenCountReplaceChain]]) is spec-pinned.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeTokenCount: merge list must be non-empty")
    require(merges.forall { case (a, b) =>
        a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" ") },
      s"bpeTokenCount: merge symbols must be non-empty and space-free, got $merges")
    import org.apache.spark.sql.graft.ColumnBridge
    coalesce(
      ColumnBridge.column(graft.plans.BpeEncodeCount(
        ColumnBridge.expression(lower(text)), merges)),
      lit(0L))
  }

  /** The pre-round-10 replace-chain form of [[bpeTokenCount]] — one
    * Catalyst `replace` per merge folded into the expression tree.
    * Identical semantics (the chain IS the documented contract); kept
    * as the parity reference for the native kernel and as the
    * composition an engine without expression extensions would run.
    * Unusable at production merge-list sizes (a 32k-deep tree breaks
    * codegen) — gates and serving go through [[bpeTokenCount]].
    */
  def bpeTokenCountReplaceChain(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeTokenCountReplaceChain: merge list must be non-empty")
    val perWord = (w: Column) => {
      val spelled = array_join(split(w, ""), " ")
      val merged = merges.foldLeft(spelled) { case (s, (a, b)) =>
        replace(s, lit(a + " " + b), lit(a + b))
      }
      length(merged) - length(replace(merged, lit(" "), lit(""))) + lit(1)
    }
    coalesce(
      aggregate(transform(tokens(lower(text)), perWord), lit(0L),
        (acc, x) => acc + x.cast(LongType)),
      lit(0L))
  }

  /** HTML stripping — the first cleaning pass over crawled markup
    * before any quality/dedup stage: tags (`<...>`) become spaces, the
    * five XML entities decode, and whitespace runs collapse to one
    * space. Entity decode is a LITERAL replace chain with `&amp;`
    * LAST, so double-escaped text decodes one level exactly
    * (`&amp;lt;` → `&lt;`, never `<`) — the documented, engine-
    * replayable order (DuckDB `replace`/`regexp_replace(...,'g')`
    * reproduce it byte-for-byte; the driver gate does). Not an HTML5
    * parser by design: comments/script bodies survive as text, which
    * the boilerplate/C4 line filters downstream are for.
    *
    * The collapse class is the EXPLICIT `[ \t\n\x0B\f\r]` (Java's
    * `\s`), not a `\s` shorthand: RE2's `\s` excludes U+000B, so a
    * shorthand would silently diverge between this operator and any
    * RE2-based replayer (DuckDB included) on vertical-tab input. Both
    * sides of the driver gate pin the same literal class.
    *
    * Scale shape: one narrow codegen'd projection — no shuffle, no
    * state; pushes inside whatever scan precedes it.
    */
  def stripHtml(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }
}
