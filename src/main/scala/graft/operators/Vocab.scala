package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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
}
