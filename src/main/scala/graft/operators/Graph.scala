package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph centrality for web-corpus curation. Crawl pipelines rank
 * pages/domains by link centrality (Common Crawl publishes harmonic
 * and PageRank centrality per domain; curation uses it as a quality
 * prior) — this is that computation in Spark-join form, made
 * ENGINE-REPRODUCIBLE the same way the drift/retrieval families are:
 * all arithmetic in scaled BIGINT with floor division, a fixed
 * iteration count, no doubles anywhere.
 */
object Graph {

  /** Integer-scaled PageRank over an edge list — `iterations` rounds of
    * the public power-iteration form, rank mass in parts-per-billion:
    *
    *   rank₀(v)   = 10⁹ div N
    *   contrib(e) = (rank(src)·d_ppm div 10⁶) div outdeg(src)   per EDGE
    *   rank'(v)   = (10⁹·(10⁶−d_ppm)) div (N·10⁶) + Σ contrib(e: e.dst=v)
    *
    * Multi-edges each contribute (a transition graph's natural
    * weighting); dangling mass (nodes with no out-edges) is DROPPED,
    * not redistributed — ranks then sum to < 10⁹, which is documented
    * and deterministic (the redistribution variant needs one extra
    * 1-row aggregate per round; add it when the use case needs
    * stochastic-matrix exactness). Every step is exact integer
    * arithmetic, so an oracle replays the ranks bit-for-bit by
    * unrolling the iterations.
    *
    * Scale shape: per round, ONE shuffle of the edge list joined to the
    * current ranks (ids + longs, never payloads) and a map-side-combined
    * sum per destination; `localCheckpoint` cuts the growing iteration
    * lineage (the [[Dedup.connectedComponents]] discipline). Node and
    * out-degree tables build once. Fixed small `iterations` (web-rank
    * practice: a handful of rounds already orders domains usefully);
    * convergence detection is deliberately not built in — a fixed count
    * is reproducible, a tolerance is not.
    *
    * Output: `(node STRING, rank_ppb BIGINT)`.
    */
  def pageRankScaled(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPpm: Long = 850000L
  ): DataFrame = {
    require(iterations >= 1, s"pageRankScaled: iterations must be >= 1, got $iterations")
    require(dampingPpm >= 0L && dampingPpm <= 1000000L,
      s"pageRankScaled: dampingPpm must be in [0, 1e6], got $dampingPpm")
    val scale = 1000000000L
    val e = edges
      .select(col(srcCol).cast("string").as("_s"), col(dstCol).cast("string").as("_d"))
      .filter(col("_s").isNotNull && col("_d").isNotNull)
      .localCheckpoint()
    val nodes = e.select(col("_s").as("_v"))
      .unionByName(e.select(col("_d").as("_v")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRankScaled: empty graph")
    // n·10⁶ would overflow Long past ~9.2e12 nodes (the unimaxBudgets
    // guard discipline); no real graph gets there, but fail loudly
    require(n <= Long.MaxValue / 1000000L,
      s"pageRankScaled: node count $n overflows the ppm product")
    val outdeg = e.groupBy("_s").agg(count(lit(1)).as("_od")).localCheckpoint()
    val base = (scale * (1000000L - dampingPpm)) / (n * 1000000L)
    var ranks = nodes.select(col("_v"), lit(scale / n).as("_r"))
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("_v", "_s"), Seq("_s"))
        .join(outdeg, Seq("_s"))
        .select(col("_d").as("_v"),
          expr(s"(_r * ${dampingPpm}L div 1000000L) div _od").as("_c"))
        .groupBy("_v").agg(sum(col("_c")).as("_in"))
      ranks = nodes.join(contrib, Seq("_v"), "left")
        .select(col("_v"), (lit(base) + coalesce(col("_in"), lit(0L))).as("_r"))
        .localCheckpoint()
    }
    ranks.select(col("_v").as("node"), col("_r").as("rank_ppb"))
  }
}
