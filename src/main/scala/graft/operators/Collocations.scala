package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions

/**
 * Collocation mining — the corpus-statistics pass that surfaces
 * multi-word expressions ("new york", "machine learning") for tokenizer
 * vocab decisions, stopword-phrase lists, and boilerplate phrase
 * detection. Bigrams rank by LIFT = P(xy) / (P(x·)·P(·y)), the
 * exponential of PMI (Church & Hanks 1990): ln is monotone, so the
 * lift ranking IS the PMI ranking — and unlike PMI the lift stays
 * transcendental-free, three IEEE ops on exact integer counts
 * ((c_xy·N)/(c_x·c_y) as doubles), bit-reproducible across engines.
 *
 * Probabilities are defined over the bigram stream itself: N = total
 * bigram occurrences, c_x = occurrences as FIRST word, c_y = as SECOND
 * — self-consistent, no token/bigram denominator mismatch at document
 * edges.
 *
 * Scale shape: one narrow tokenize+pair explode compressed immediately
 * by a map-side-combined bigram histogram (pairs of words cross the
 * wire counted, never repeated); the marginals derive from the
 * HISTOGRAM (Σ per-first / per-second over distinct bigrams — vocab-
 * sized, not corpus-sized); `minCount` prunes the join's left side
 * before the marginal joins (AQE broadcasts it when small); the final
 * cut is a `TakeOrdered` top-k — no global sort materializes.
 */
object Collocations {

  /** Top-`k` bigrams by lift: `(w1, w2, c_xy, c_x, c_y, lift)`, ties
    * broken by `(w1, w2)` for a total, engine-reproducible order.
    * `minCount` suppresses the low-count noise PMI-family scores are
    * notorious for (a 1-occurrence pair of two rare words otherwise
    * tops every list).
    */
  def topBigramsByLift(
      docs: DataFrame,
      textCol: String,
      k: Int,
      minCount: Long = 5L
  ): DataFrame = {
    require(k > 0, s"topBigramsByLift: k must be positive, got $k")
    require(minCount >= 1, s"topBigramsByLift: minCount must be >= 1")
    val toks = docs
      .select(TextFunctions.tokens(lower(col(textCol))).as("t"))
      .filter(size(col("t")) >= 2)
    // consecutive pairs via zip of the array against its own tail —
    // narrow, no positional self-join of exploded tokens
    val pairs = toks.select(explode(zip_with(
      slice(col("t"), lit(1), size(col("t")) - 1),
      slice(col("t"), lit(2), size(col("t")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val hist = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_xy"))
    // marginals and the total reduce over the HISTOGRAM, not the corpus
    val firsts = hist.groupBy(col("w1")).agg(sum(col("c_xy")).as("c_x"))
    val seconds = hist.groupBy(col("w2")).agg(sum(col("c_xy")).as("c_y"))
    val total = hist.agg(sum(col("c_xy")).as("n"))
    // fixed operand tree: (c_xy · N) / (c_x · c_y), each cast to double
    // first — correctly-rounded IEEE mult/div on identical operands is
    // bit-identical in any engine, and doubles don't overflow where
    // int64 products would (c_xy·N ≈ 1e26 at 100 TB)
    val lift = (col("c_xy").cast(DoubleType) * col("n").cast(DoubleType)) /
      (col("c_x").cast(DoubleType) * col("c_y").cast(DoubleType))
    hist.filter(col("c_xy") >= minCount)
      .join(firsts, Seq("w1"))
      .join(seconds, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        lift.as("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
