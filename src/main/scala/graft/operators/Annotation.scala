package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Multi-rater annotation QA — the label-quality statistics an
 * RLHF / annotation pipeline runs before trusting human labels:
 * per-unit consensus (what label does a unit get) and corpus-level
 * chance-corrected agreement across ANY number of raters with missing
 * ratings (Krippendorff's alpha — the multi-rater generalization the
 * two-fixed-rater [[Profile.cohenKappaE6]] cannot express).
 *
 * Reference parity note: the reference bundle has no annotation
 * tooling — this sits in the LLM-pipeline surface beside the
 * eval-stats and preference families (SURVEY §3).
 */
object Annotation {

  /** Per-unit CONSENSUS label: majority vote with ties to the
    * lexicographically smallest label (deterministic, engine-
    * replayable), plus the unit's rating count and the winner's vote
    * share. Null units/labels drop (no vote is defined for a missing
    * rating). Output: `(unit STRING, label STRING, n_ratings BIGINT,
    * support_ppm BIGINT)` with `support_ppm = votes·10⁶ div n_ratings`.
    *
    * Scale shape: one map-side-combined aggregate to (unit, label)
    * counts, then one min_by reduction per unit — never a window, never
    * a rating-row shuffle beyond the first aggregate.
    */
  def consensusLabels(
      df: DataFrame,
      unitCol: String,
      labelCol: String
  ): DataFrame = {
    val uc = df
      .select(col(unitCol).cast(StringType).as("_u"),
        col(labelCol).cast(StringType).as("_l"))
      .filter(col("_u").isNotNull && col("_l").isNotNull)
      .groupBy(col("_u"), col("_l")).agg(count(lit(1)).as("_c"))
    uc.groupBy(col("_u"))
      .agg(
        min_by(struct(col("_l"), col("_c")),
          struct((-col("_c")).as("_nc"), col("_l"))).as("_w"),
        sum(col("_c")).as("n_ratings"))
      .select(col("_u").as("unit"), col("_w._l").as("label"),
        col("n_ratings"),
        expr("(_w._c * 1000000L) div n_ratings").as("support_ppm"))
  }

  /** Krippendorff's alpha for NOMINAL data (Krippendorff 2004 §11;
    * the 1970 coincidence-matrix construction): chance-corrected
    * agreement over units rated by a VARIABLE number of raters, with
    * missing ratings handled by construction — units with fewer than 2
    * ratings carry no agreement information and drop entirely (their
    * labels never enter the marginals either).
    *
    * Arithmetic, exact where the statistic allows it:
    *
    *  - per unit u with m_u ≥ 2 ratings and label counts n_uv, the
    *    observed-disagreement mass is the ordered disagreeing pairs
    *    normalized by (m_u − 1):  d_u / (m_u − 1) with
    *    d_u = m_u² − Σ_v n_uv²  — an exact integer numerator; the ONE
    *    rational step floors at e6 per unit:
    *    `do_e6 += (d_u · 10⁶) div (m_u − 1)` (both engines share the
    *    floor, bias < 10⁻⁶ per unit, recorded in the output scale);
    *  - the coincidence marginals are EXACT integers: n_v = Σ_u n_uv,
    *    n = Σ_u m_u (over kept units);
    *  - alpha = 1 − D_o/D_e with D_e = (n² − Σ_v n_v²)/(n − 1), so
    *    `alpha_ppm = 10⁶ − (do_e6 · (n − 1)) div (n² − Σ_v n_v²)` —
    *    computed driver-side in BigInt (n² overflows int64 past ~3·10⁹
    *    ratings), truncation toward zero (the [[Profile.cohenKappaE6]]
    *    convention, shared with DuckDB `//` for the positive
    *    denominator).
    *
    * A degenerate corpus (every kept rating the same label — D_e = 0)
    * emits NOTHING: alpha is undefined there, not 0 (the kappa
    * convention). Output one row:
    * `(n_units, n_ratings, do_e6, alpha_ppm)` — all BIGINT.
    *
    * Scale shape: one aggregate to (unit, label) counts, one per-unit
    * reduction, one ≤K-row label-marginal aggregate collected as
    * driver metadata (the cohenKappa discipline) — rating rows shuffle
    * once, as counts.
    */
  def krippendorffAlphaNominalE6(
      df: DataFrame,
      unitCol: String,
      labelCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val uc = df
      .select(col(unitCol).cast(StringType).as("_u"),
        col(labelCol).cast(StringType).as("_l"))
      .filter(col("_u").isNotNull && col("_l").isNotNull)
      .groupBy(col("_u"), col("_l")).agg(count(lit(1)).as("_c"))
      .localCheckpoint() // the per-unit reduction AND the marginals read it
    val per = uc.groupBy(col("_u"))
      .agg(sum(col("_c")).as("_m"),
        sum(col("_c") * col("_c")).as("_ss"))
      .filter(col("_m") >= 2L)
      .filter(assert_true(col("_m") <= lit(3000000L),
        lit("krippendorffAlphaNominalE6: a unit carries > 3*10^6 ratings " +
          "— downsample the unit (the bound keeps (m^2 - ss)*10^6 inside " +
          "exact int64)")).isNull)
      .select(col("_u"), col("_m"),
        expr("((_m * _m - _ss) * 1000000L) div (_m - 1L)").as("_do"))
      .localCheckpoint() // totals AND the kept-unit semi-join read it
    val tot = per.agg(count(lit(1)).as("_units"), sum(col("_m")).as("_n"),
      sum(col("_do")).as("_doe6")).head()
    if (tot.isNullAt(1) || tot.getLong(1) == 0L)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("n_units", "n_ratings", "do_e6", "alpha_ppm")
    val (nUnits, n, doE6) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val nv = uc.join(per.select(col("_u")), Seq("_u"), "left_semi")
      .groupBy(col("_l")).agg(sum(col("_c")).as("_nv"))
      .select(col("_nv")).as[Long].collect() // ≤K label marginals — metadata
    val bn = BigInt(n)
    val denom = bn * bn - nv.map(v => BigInt(v) * BigInt(v)).sum
    if (denom == 0)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("n_units", "n_ratings", "do_e6", "alpha_ppm")
    val alphaPpm = BigInt(1000000) - BigInt(doE6) * (bn - 1) / denom
    Seq((nUnits, n, doE6, alphaPpm.toLong))
      .toDF("n_units", "n_ratings", "do_e6", "alpha_ppm")
  }

  /** Krippendorff's alpha for INTERVAL data — numeric ratings where
    * the SIZE of a disagreement matters (quality scores 1–5: raters
    * saying 4 vs 5 agree far more than 1 vs 5, which the nominal form
    * cannot see): distance δ(v, k) = (v − k)². The pair sums collapse
    * to moments, so no label-pair table ever forms:
    *
    *   Σ_{v,k} n_v n_k (v − k)² = 2·(S0·S2 − S1²)
    *   with S0 = Σn_v, S1 = Σn_v·v, S2 = Σn_v·v²
    *
    * per unit (observed, normalized by m_u − 1, the one e6-floored
    * rational step — the nominal form's convention) and globally
    * (expected, normalized by n − 1, BigInt driver finish). Ratings
    * must be integers with |v| ≤ 10³ and units ≤ 10⁶ ratings (zero-
    * action tripwires — keeps the per-unit moment products m·S2 and
    * S1² inside exact int64; the ·10⁶ e6 scaling widens to
    * DECIMAL(38,0) first because it does NOT fit). Rescale wider
    * scores upstream. Units with < 2 ratings drop; a degenerate
    * corpus (every kept rating equal — D_e = 0) emits nothing.
    * Output: `(n_units, n_ratings, do_e6, alpha_ppm)`.
    */
  def krippendorffAlphaIntervalE6(
      df: DataFrame,
      unitCol: String,
      valueCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = df
      .select(col(unitCol).cast(StringType).as("_u"),
        col(valueCol).cast(org.apache.spark.sql.types.LongType).as("_v"))
      .filter(col("_u").isNotNull && col("_v").isNotNull)
      .filter(assert_true(abs(col("_v")) <= lit(1000L),
        lit("krippendorffAlphaIntervalE6: |rating| must be <= 10^3 — " +
          "rescale wider scores upstream (the bound keeps the moment " +
          "products inside exact int64)")).isNull)
    val per = r.groupBy(col("_u"))
      .agg(count(lit(1)).as("_m"), sum(col("_v")).as("_s1"),
        sum(col("_v") * col("_v")).as("_s2"))
      .filter(col("_m") >= 2L)
      .filter(assert_true(col("_m") <= lit(1000000L),
        lit("krippendorffAlphaIntervalE6: a unit carries > 10^6 ratings " +
          "— downsample the unit (the bound keeps S0*S2 inside exact " +
          "int64)")).isNull)
      .select(col("_u"), col("_m"), col("_s1"), col("_s2"),
        // m*S2 and S1^2 each fit int64 at the tripwired bounds, but the
        // *10^6 e6 scaling does NOT — widen to DECIMAL(38,0) BEFORE the
        // scaling (the same decimal handling as the global T1/T2 sums);
        // IntegralDivide then lands back in int64: per-unit do_e6 is
        // bounded by 2*m*10^12 <= 2*10^18 at m = 10^6.
        expr("(cast(_m * _s2 - _s1 * _s1 as decimal(38,0)) * 2000000L)" +
          " div (_m - 1L)").as("_do"))
      .localCheckpoint() // totals and the degenerate check read it
    val tot = per.agg(count(lit(1)).as("_units"), sum(col("_m")).as("_n"),
      sum(col("_s1").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("_t1"),
      sum(col("_s2").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("_t2"),
      sum(col("_do").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("_doe6")).head()
    if (tot.isNullAt(1) || tot.getLong(1) == 0L)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("n_units", "n_ratings", "do_e6", "alpha_ppm")
    val (nUnits, n) = (tot.getLong(0), tot.getLong(1))
    val doE6 = BigInt(tot.getDecimal(4).toBigInteger)
    require(doE6 <= BigInt(Long.MaxValue),
      "krippendorffAlphaIntervalE6: total observed-disagreement mass " +
        "exceeds int64 at e6 scale — rescale ratings upstream")
    val t1 = BigInt(tot.getDecimal(2).toBigInteger)
    val t2 = BigInt(tot.getDecimal(3).toBigInteger)
    val bn = BigInt(n)
    val denom = 2 * (bn * t2 - t1 * t1)
    if (denom == 0)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("n_units", "n_ratings", "do_e6", "alpha_ppm")
    val alphaPpm = BigInt(1000000) - doE6 * (bn - 1) / denom
    Seq((nUnits, n, doE6.toLong, alphaPpm.toLong))
      .toDF("n_units", "n_ratings", "do_e6", "alpha_ppm")
  }
}
