package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/**
 * Lexical retrieval over a document corpus: BM25 (Robertson/Spärck
 * Jones probabilistic ranking, the Lucene `k1`/`b` parameterization
 * with the +1 idf floor) — the keyword complement to the embedding ANN
 * surface in [[Similarity]]. Training-data curation uses it for
 * query-driven subset selection and hard-negative mining next to
 * vector search.
 *
 * Scale shape: the postings list `(term, doc, tf)` is built with one
 * map-side-combined aggregation (term payloads are the only text that
 * shuffles, once); document length is a NARROW `size(tokens())`
 * projection (no shuffle); the corpus-level scalars (N, avgdl) ride a
 * 1-row broadcast; per-term df joins the postings on `term` where AQE
 * broadcasts the (vocabulary-sized) side when it fits. Queries are
 * assumed metadata-sized and broadcast, so scoring never shuffles the
 * postings again; the per-(query, doc) reduction and the k-bounded
 * `graft_topk` heap aggregate the small scored slice.
 *
 * Determinism: idf is rounded to 6 dp (`ln` is the one libm-dependent
 * step), each per-term contribution to 9 dp, and the per-doc score is
 * an EXACT DECIMAL(38,9) sum of those contributions — so an external
 * engine re-running the same formula reproduces scores bit-for-bit
 * regardless of summation order (the `dsir_scores` convention).
 */
object Retrieval {

  /** BM25 top-k documents per query. Output: `(query_id, neighbor_id,
    * score, rank)` — `score` is DECIMAL(38,9), rank 1-based, ties
    * broken by ascending doc id. Tokenization is whitespace tokens of
    * the lowercased text on both sides; repeated query terms count
    * once (the classic query-side simplification).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(lower(col(textCol))).as("_toks"))
    // postings: the one aggregation that shuffles term text
    val tf = buildPostings(docs, idCol, textCol)
    // doc length is narrow; corpus scalars are one tiny agg row.
    // Computed from the raw token arrays, so zero-token docs COUNT
    // toward N/avgdl here (unlike the postings-derived form).
    val doclen = toks.select(col("id"), size(col("_toks")).cast(LongType).as("dl"))
    rankPostings(tf, doclen, queries, queryIdCol, queryTextCol, k, k1, b)
  }

  /** The BM25 postings table for a document corpus: `(term, id, tf)` —
    * one map-side-combined aggregation; what [[bm25TopKFromPostings]]
    * scores against and what the streaming index maintains
    * incrementally ([[graft.streaming.StreamingOps.bm25IndexStream]]).
    */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** BM25 top-k against a PREBUILT postings table (e.g. the committed
    * version of the streaming index). Document length derives from the
    * postings themselves (`dl = Σ_t tf`), so docs that produced zero
    * tokens are absent from N/avgdl — identical results to
    * [[bm25TopK]] whenever every doc has at least one token.
    */
  def bm25TopKFromPostings(
      postings: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val doclen = postings.groupBy("id").agg(sum(col("tf")).as("dl"))
    rankPostings(postings, doclen, queries, queryIdCol, queryTextCol, k, k1, b)
  }

  private def rankPostings(
      tf: DataFrame,
      doclen: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double,
      b: Double
  ): DataFrame = {
    val stats = doclen.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(array_distinct(TextFunctions.tokens(lower(col(queryTextCol)))))
        .as("term"))
    // avgdl = sum_dl / n_docs: exact inputs, one correctly-rounded
    // division — identical in any IEEE engine. Same for the tfnorm
    // chain below: every operand is exact (longs, literals) or shared,
    // and the operation ORDER is fixed, so doubles match bit-for-bit.
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs").cast(DoubleType)
    val idf6 = round(
      log((col("n_docs").cast(DoubleType) - col("df").cast(DoubleType) + 0.5) /
        (col("df").cast(DoubleType) + 0.5) + 1.0), 6)
    val tfd = col("tf").cast(DoubleType)
    val tfnorm = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast(DoubleType) / avgdl)))
    val contrib = round(idf6 * tfnorm, 9).cast(DecimalType(38, 9))
    val scored = broadcast(qterms)
      .join(tf, Seq("term"))
      .join(df, Seq("term"))
      .join(doclen, Seq("id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(contrib).as("score"))
      .select(col("query_id"), col("neighbor_id"),
        col("score").cast(DecimalType(38, 9)).as("score"))
    graft.plans.TopKAggregate.register(tf.sparkSession)
    scored
      .groupBy("query_id")
      .agg(call_function("graft_topk",
        struct(col("score"), (-col("neighbor_id")).as("_nid")), lit(k)).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(
        col("query_id"),
        (-col("_e._nid")).as("neighbor_id"),
        col("_e.score").as("score"),
        (col("_pos") + 1).cast(IntegerType).as("rank"))
  }
}
