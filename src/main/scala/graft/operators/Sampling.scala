package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data curation — the "mix 50% of
 * web, all of books, 10% of logs" step of assembling a training set.
 *
 * Decisions are pure functions of (key, salt): `keep ⇔ low 10 bits of
 * FNV-1a(key ++ ':' ++ salt) < fraction × 1024`. That buys, at any
 * scale:
 *  - reproducibility: re-running, re-partitioning, or re-reading the
 *    corpus yields the SAME sample (unlike `df.sample`, which is
 *    seed+partition-layout dependent);
 *  - stability under appends: a doc's fate never changes when other
 *    docs arrive, so incremental pipelines can sample micro-batches
 *    independently and the union equals sampling the union;
 *  - narrowness: one codegen'd hash per row, no shuffle, filter pushes
 *    to the scan;
 *  - auditability: any engine can recompute membership (FNV-1a is
 *    portable SQL — see graft.plans.FnvHash64 — and the driver gate's
 *    DuckDB oracle recomputes the exact sample).
 *
 * Fraction granularity is 1/1024 (documented; low bits of the hash are
 * signed/unsigned-agnostic, which is what makes the decision portable).
 * Change `salt` to draw an independent sample.
 */
object Sampling {

  val Buckets = 1024

  /** The sampling bucket in [0, 1024) for a key — low 10 hash bits. */
  def sampleBucket(key: Column, salt: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(key.cast("string"), lit(":" + salt)))))
    h.bitwiseAND(lit((Buckets - 1).toLong))
  }

  private def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    math.round(fraction * Buckets)
  }

  /** Keep a deterministic `fraction` of rows, decided per `keyCol`. */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = "graft"
  ): DataFrame =
    df.filter(sampleBucket(col(keyCol), salt) < threshold(fraction))

  /** Per-stratum fractions (e.g. per source/language), one narrow pass:
    * rows in a stratum listed in `fractions` sample at that rate, others
    * at `defaultFraction`. Strata are driver-known configuration (like
    * binner specs), so the thresholds compile to a codegen'd CASE chain —
    * no join.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "graft"
  ): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldRight(
      lit(threshold(defaultFraction))) { case ((stratum, frac), els) =>
      when(col(strataCol) === stratum, lit(threshold(frac))).otherwise(els)
    }
    df.filter(sampleBucket(col(keyCol), salt) < thr)
  }

  /** Deterministic DISJOINT splits (train/val/test): one portable FNV
    * bucket per key decides every membership at once — labels are
    * stable across runs, engines, and repartitioning, and because a
    * label's bucket range only ever extends when its cumulative
    * fraction grows, growing the train share never moves a row OUT of
    * train (the leakage-safety property ad-hoc `rand()` splits lack).
    * Boundaries are `round(cumFraction · 1024)` in the written order;
    * fractions summing to 1 cover every row, a shortfall leaves a
    * null-labeled holdout, and null keys label null. Narrow codegen'd
    * pass — no shuffle, no join.
    */
  def splitByHash(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft",
      outCol: String = "split"
  ): DataFrame = {
    require(splits.nonEmpty, "splitByHash: need at least one split")
    splits.foreach { case (name, f) =>
      require(f >= 0.0 && f <= 1.0, s"splitByHash: fraction for '$name' out of [0,1]: $f")
    }
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).drop(1)
    require(cum.last <= 1.0 + 1e-9,
      s"splitByHash: fractions sum to ${cum.last} > 1")
    val bounds = cum.map(c => math.round(math.min(c, 1.0) * Buckets))
    val label = splits.map(_._1).zip(bounds)
      .foldRight(lit(null).cast("string")) { case ((name, bound), els) =>
        when(col("_graft_sb") < bound, lit(name)).otherwise(els)
      }
    df.withColumn("_graft_sb", sampleBucket(col(keyCol), salt))
      .withColumn(outCol, label)
      .drop("_graft_sb")
  }

  /** Deterministic NEGATIVE sampling — the contrastive-training data
    * prep: for every anchor, the k candidates with the largest signed
    * FNV of the PAIR string `anchor ++ ":" ++ cand ++ ":" ++ salt` (the
    * pair hash makes each anchor draw an independent pseudo-random
    * negative set — hashing the candidate alone would hand every anchor
    * the same winners). Self-pairs are excluded; change `salt` for a
    * fresh epoch of negatives. Semantically a uniform without-
    * replacement draw per anchor, reproducible by any engine that
    * recomputes the hash.
    *
    * Scale shape: the anchor set is the SMALL side by construction
    * (broadcast cross join); the pool streams through once with a
    * bounded per-anchor `graft_topk` heap (the [[quotaPerGroup]]
    * machinery) — no shuffle of the pool, no |anchors|·|pool|
    * materialization past the heaps. Output: `(anchor, negative,
    * rank)`, rank 1..k by (hash desc, cand desc).
    */
  def negativeSamples(
      anchors: DataFrame,
      anchorCol: String,
      pool: DataFrame,
      candCol: String,
      k: Int,
      salt: String = "neg"
  ): DataFrame = {
    require(k > 0, s"negativeSamples: k must be positive, got $k")
    import org.apache.spark.sql.graft.ColumnBridge
    val a = anchors.select(col(anchorCol).cast("string").as("_anchor")).distinct()
    val p = pool.select(col(candCol).cast("string").as("_cand"))
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(col("_anchor"), lit(":"),
        col("_cand"), lit(":" + salt)))))
    val joined = p.crossJoin(broadcast(a))
      .filter(col("_anchor") =!= col("_cand"))
      .withColumn("_fnv", h)
    quotaPerGroup(joined, "_cand", "_anchor", "_fnv", k, keepSmallest = false)
      .select(col("_anchor").as("anchor"), col("_cand").as("negative"), col("rank"))
  }

  /** Leakage-safe TEMPORAL split — the time-series complement to
    * [[splitByHash]]: when evaluation data must postdate training data
    * (dedup/decontamination cannot fix temporal leakage — a model must
    * not train on the future it will be tested on), rows split by an
    * event-time column into `train` (t < trainEndExclusive), `test`
    * (t ≥ testStartInclusive), and an explicit `gap` label for the
    * buffer in between. The gap is first-class, not dropped silently:
    * near-boundary rows often leak through derived features (windows,
    * sessions, rolling stats that straddle the cut), and an audit that
    * cannot SEE the buffer cannot check it.
    *
    * Narrow per-row labeling — no shuffle, no lookup; boundaries are
    * plain literals, so any engine replays the exact member sets.
    */
  def temporalSplit(
      df: DataFrame,
      time: Column,
      trainEndExclusive: Long,
      testStartInclusive: Long,
      outCol: String = "split"
  ): DataFrame = {
    require(testStartInclusive >= trainEndExclusive,
      s"temporalSplit: testStart $testStartInclusive < trainEnd $trainEndExclusive " +
        "would let test rows predate the end of training data")
    df.withColumn(outCol,
      when(time.isNull, lit(null).cast("string"))
        .when(time < lit(trainEndExclusive), lit("train"))
        .when(time >= lit(testStartInclusive), lit("test"))
        .otherwise(lit("gap")))
  }

  /** Quality-weighted sampling — the "sample good docs more" mixing
    * step: each row keeps with probability `fraction × clamp(weight,
    * 0, 1)`, where `weight` is any per-row column (a quality score, a
    * length-based weight, an upstream model signal). Same deterministic
    * FNV decision as the other samplers — append-stable, shuffle-free,
    * engine-recomputable — with the per-row threshold
    * `round(clamp(weight)·fraction·1024)` computed in plain double
    * arithmetic so an oracle reproduces the exact member set. The
    * rounding rule matches [[deterministicSample]]'s `round` exactly, so
    * `weight = 1.0` keeps the SAME rows as a plain sample at every
    * fraction (spec-pinned; a floor here diverged for fractions where
    * round ≠ floor). Rows with null weight drop (null threshold → null
    * comparison → filtered): an unscored doc is not silently kept.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weight: Column,
      fraction: Double,
      salt: String = "graft"
  ): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    val thr = round(w * lit(fraction * Buckets)).cast("long")
    df.filter(sampleBucket(col(keyCol), salt) < thr)
  }

  /** Exactly-`n` deterministic global sample: the n rows whose full
    * 64-bit `FNV-1a(key ++ ':' ++ salt)` hash is LARGEST (signed
    * comparison; among equal hashes the larger key wins, so the order
    * is total — a 64-bit collision is ~n²/2⁶⁴). Fraction-based
    * sampling can't hit an exact count; bottom-k-by-hash can, and
    * stays deterministic under re-partitioning and appends-then-
    * resample-the-union (a row's hash never moves).
    *
    * Scale shape: the selection reduces through
    * [[graft.plans.TopKAggregate]]'s bounded heap — map-side partial
    * top-n per input partition, so the shuffle carries at most
    * n·partitions candidate rows and there is NO global sort. The n
    * selected keys then broadcast back as a left-semi join. `n` is
    * therefore driver-bounded metadata: fine for the "give me exactly
    * 100k eval docs" shape this exists for; for samples too large to
    * broadcast, use [[deterministicSample]] and accept the ±binomial
    * count.
    */
  def sampleExactN(
      df: DataFrame,
      keyCol: String,
      n: Int,
      salt: String = "graft"
  ): DataFrame = {
    require(n > 0, s"sampleExactN: n must be positive, got $n")
    import org.apache.spark.sql.graft.ColumnBridge
    graft.plans.TopKAggregate.register(df.sparkSession)
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(col(keyCol).cast("string"), lit(":" + salt)))))
    val winners = df
      .select(h.as("_h"), col(keyCol).as("_k"))
      .agg(call_function("graft_topk", struct(col("_h"), col("_k")), lit(n)).as("_t"))
      .select(explode(col("_t")).as("_e"))
      .select(col("_e._k").as(keyCol))
    df.join(broadcast(winners), Seq(keyCol), "left_semi")
  }

  /** Exactly n rows PER GROUP, deterministically: the stratified twin
    * of [[sampleExactN]] — within each group, the n keys with the
    * largest full 64-bit FNV hash (signed order) win. Groups smaller
    * than n keep everything. Output: `(<groupCol>, <keyCol>, rank)`
    * with rank 1-based by descending hash — semantically a uniform
    * without-replacement draw per stratum, reproducible by any engine
    * that recomputes the hash.
    *
    * Scale shape: one map-side-combined `graft_topk` heap per group —
    * the shuffle carries at most n·partitions candidate (hash, key)
    * pairs per group and there is NO per-group window or sort (the
    * [[quotaPerGroup]] machinery with the hash as the order column).
    * n is quota-sized metadata; the group count is unbounded.
    */
  def sampleExactNPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      n: Int,
      salt: String = "graft"
  ): DataFrame = {
    require(n > 0, s"sampleExactNPerGroup: n must be positive, got $n")
    import org.apache.spark.sql.graft.ColumnBridge
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(col(keyCol).cast("string"), lit(":" + salt)))))
    quotaPerGroup(df.withColumn("_fnv", h), keyCol, groupCol, "_fnv", n,
      keepSmallest = false)
  }

  /** Resample to a target domain MIXTURE (the application step of
    * DoReMi-style domain reweighting): given proportional target
    * weights `targets(stratum) = p` — any positive scale, they need
    * not sum to 1 — keep the largest subcorpus whose stratum shares
    * match the target. With stratum counts `n_s`, the achievable total
    * is `T = min_s(n_s / p_s)` and each stratum keeps fraction
    * `f_s = p_s·T / n_s`; the binding (scarcest-relative-to-target)
    * stratum keeps everything. Strata absent from `targets` are
    * dropped; target strata absent from the DATA are ignored in the
    * binding computation (you can't bind on zero rows).
    *
    * Membership is the same per-key FNV decision as the other
    * samplers (append-stable at fixed counts, engine-recomputable;
    * realized shares quantize to the 1/1024 bucket grid). Unlike them
    * it needs the counts: ONE count-only aggregation runs eagerly at
    * call time (the thresholds are ≤ |targets| rows of driver
    * metadata), and membership is then the [[stratifiedSample]] shape —
    * a codegen'd CASE chain, no join, rows never shuffle. The threshold
    * arithmetic is fixed-order double (`round(p·T / n × 1024)`),
    * reproducible bit-for-bit by an external engine.
    */
  def mixToTarget(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      targets: Map[String, Double],
      salt: String = "graft"
  ): DataFrame = {
    require(targets.nonEmpty, "mixToTarget: targets must be non-empty")
    require(targets.values.forall(_ > 0.0),
      "mixToTarget: target weights must be positive (omit a stratum to drop it)")
    import df.sparkSession.implicits._
    val tgt = targets.toSeq.sortBy(_._1).toDF("_stratum", "_p")
    val counts = df.groupBy(col(strataCol).as("_stratum"))
      .agg(count(lit(1)).as("_n"))
    val joined = counts.join(tgt, Seq("_stratum"))
    val tRow = joined.agg(min(col("_n").cast("double") / col("_p")).as("_T"))
    // materialize the thresholds NOW: ≤ |targets| rows of metadata, one
    // counting job. (Leaving them lazy embedded `joined` — and its full
    // count aggregation — in TWO plan branches plus the membership
    // filter, so the corpus was scanned three times per action; the
    // arithmetic is unchanged, it just runs once, driver-visible.)
    val thrRows = joined.crossJoin(tRow).select(
        col("_stratum"),
        round(col("_p") * col("_T") / col("_n").cast("double") * Buckets)
          .cast("long").as("_thr"))
      .collect()
    // membership is the stratifiedSample shape: a codegen'd CASE chain
    // over driver-known thresholds — no join, rows never shuffle
    val thrCase = thrRows.sortBy(_.getString(0)).foldRight(lit(-1L): Column) {
      case (r, els) =>
        when(col(strataCol) === r.getString(0), lit(r.getLong(1))).otherwise(els)
    }
    df.filter(sampleBucket(col(keyCol), salt) < thrCase)
  }

  /** Temperature-scaled source mixing — the α-sampling of mT5/XLM-R
    * (public idea: Xue et al. 2021 §3.2; Conneau et al. 2020 §3):
    * stratum weights p_s ∝ n_s^α flatten the natural source skew, so
    * low-resource strata keep everything while each larger stratum
    * thins to (n_min/n_s)^(1−α) — α = 1 keeps the natural mix, α → 0
    * approaches uniform-by-stratum. Membership, thresholds, and
    * determinism are EXACTLY [[mixToTarget]]'s (this is that operator
    * with the weight table derived from the strata counts themselves);
    * the extra stratum-count aggregate is one map-side-combined job —
    * the standard offline mix-assembly profile.
    *
    * α = 0.5 computes p_s via `sqrt` (IEEE-correctly-rounded by
    * definition, so an oracle reproduces the thresholds bit-for-bit);
    * other α go through `pow`, which carries no such guarantee — fine
    * for serving, keep it out of hash-compared gate surfaces.
    */
  def temperatureMix(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      alpha: Double,
      salt: String = "graft"
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMix: alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val weights = counts.map { case (s, n) =>
      s -> (if (alpha == 0.5) math.sqrt(n.toDouble)
            else math.pow(n.toDouble, alpha))
    }.toMap
    if (weights.isEmpty) df.filter(lit(false))
    else mixToTarget(df, keyCol, strataCol, weights, salt)
  }

  /** Per-group quota cap — "at most n docs per domain/source", the
    * web-curation guard against a handful of hosts dominating the mix
    * (the C4/CCNet per-host cap, applied as an exact deterministic
    * rule). Keeps the n rows per group that sort FIRST by `(orderCol,
    * key)` — ascending when `keepSmallest` (first-n by id, best-n by
    * loss), descending otherwise (longest / highest-score first; ties
    * then favor the LARGER key, the heap's own direction, so the order
    * stays total either way). Rows with a null group, order, or key
    * drop (no defined position in a quota). Output: `(groupCol,
    * keyCol, rank 1..n)` — ids only; join back on the key for
    * payloads, so the heap never carries text.
    *
    * Scale shape: a bounded heap per group
    * ([[graft.plans.TopKAggregate]]) — map-side partials cap each
    * input partition at n candidates per group before the shuffle, so
    * at most n·partitions (order, key) pairs move per group and no
    * per-group sort of the full membership ever runs (a
    * `row_number().over(partitionBy(group))` window would hash the
    * whole corpus into |groups| tasks — the hot-domain task gets the
    * hot domain's every row). n is quota-sized driver metadata; the
    * group count is unbounded.
    */
  def quotaPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      orderCol: String,
      n: Int,
      keepSmallest: Boolean = true
  ): DataFrame = {
    require(n > 0, s"quotaPerGroup: n must be positive, got $n")
    graft.plans.TopKAggregate.register(df.sparkSession)
    val fn = if (keepSmallest) "graft_bottomk" else "graft_topk"
    df.select(col(groupCol), col(orderCol).as("_o"), col(keyCol).as("_k"))
      .filter(col(groupCol).isNotNull && col("_o").isNotNull &&
        col("_k").isNotNull)
      .groupBy(groupCol)
      .agg(call_function(fn, struct(col("_o"), col("_k")), lit(n)).as("_t"))
      .select(col(groupCol), posexplode(col("_t")).as(Seq("_pos", "_e")))
      .select(col(groupCol), col("_e._k").as(keyCol),
        (col("_pos") + 1).cast("int").as("rank"))
  }

  /** Per-group TOKEN budget cap — "at most `budget` tokens per
    * domain/source", the token-mass sibling of [[quotaPerGroup]]'s
    * doc-count cap: training mixes are budgeted in tokens, and a
    * 10-doc cap still lets one host land 10 book-length pages. Rows
    * are taken in ascending `keyCol` order within their group (crawl /
    * priority order — callers encode "best first" in the key) and a
    * row KEEPS while the group's running token total through it stays
    * ≤ `budget`; the first row past the line (and everything after it)
    * drops. Output: `(groupCol, keyCol, n_tokens, cum_tokens BIGINT,
    * keep BOOLEAN)` — the full accounting surface, so callers can also
    * read the spill mass. Rows with a null group, key, or token count
    * drop (no defined position in a budget). Keys must be unique
    * within their group.
    *
    * Scale shape: the inclusive within-group prefix sum comes from the
    * TWO-LEVEL bucketed design (the percentRank/shardByTokenBudget
    * machinery): key-range buckets' token sums per group reduce
    * map-side, per-group bucket offsets ride a window over the SUM
    * table (≤ groups×buckets histogram rows, never the corpus), and
    * the running sum runs per (group, bucket) — bounded partitions, so
    * a hot domain never funnels through one task the way a plain
    * `sum().over(partitionBy(group))` window would.
    */
  def tokenQuotaPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      tokensCol: Column,
      budget: Long,
      buckets: Int = 1024
  ): DataFrame = {
    require(budget > 0, s"tokenQuotaPerGroup: budget must be positive, got $budget")
    tokenQuotaCore(df, keyCol, groupCol, tokensCol, lit(budget), buckets)
  }

  /** [[tokenQuotaPerGroup]] with a PER-GROUP budget table — the apply
    * step for [[unimaxBudgets]]' allocations (each language/domain gets
    * its own token cap). Budgets are driver-known metadata (≤ #groups
    * entries), folded into a codegen'd CASE chain like [[mixToTarget]]'s
    * thresholds — no join, nothing extra shuffles. Groups ABSENT from
    * the map drop entirely (an allocation of zero). Same output,
    * ordering, and two-level prefix machinery as the single-budget
    * form.
    */
  def tokenQuotaPerGroupBudgets(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      tokensCol: Column,
      budgets: Map[String, Long],
      buckets: Int = 1024
  ): DataFrame = {
    require(budgets.nonEmpty, "tokenQuotaPerGroupBudgets: budgets must be non-empty")
    require(budgets.values.forall(_ >= 0),
      s"tokenQuotaPerGroupBudgets: budgets must be non-negative, got $budgets")
    val budgetCase = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(null).cast("long"): Column) { case ((g, b), els) =>
        when(col("_g") === g, lit(b)).otherwise(els)
      }
    tokenQuotaCore(
      df.filter(col(groupCol).isin(budgets.keys.toSeq: _*)),
      keyCol, groupCol, tokensCol, budgetCase, buckets)
  }

  /** Shared body of the token-quota pair: inclusive within-group prefix
    * sums via the two-level bucketed design, then `keep ⇔ cum ≤ budget`
    * where `budgetCol` may reference `_g` (the per-group CASE chain).
    */
  private def tokenQuotaCore(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      tokensCol: Column,
      budgetCol: Column,
      buckets: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("_g"),
        col(keyCol).cast("long").as("_k"),
        tokensCol.cast("long").as("_nt"))
      .filter(col("_g").isNotNull && col("_k").isNotNull &&
        col("_nt").isNotNull)
    val out = (d: DataFrame) => d.select(
      col("_g").as(groupCol), col("_k").as(keyCol),
      col("_nt").as("n_tokens"), col("_cum").as("cum_tokens"),
      (col("_cum") <= budgetCol).as("keep"))
    val b = base.agg(min(col("_k")).as("mn"), max(col("_k")).as("mx")).head()
    if (b.isNullAt(0)) return out(base.withColumn("_cum", col("_nt")).limit(0))
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (mx - mn) / buckets + 1)
    val binned = base.withColumn("_b", expr(s"(_k - $mn) div $width"))
    val sums = binned.groupBy("_g", "_b").agg(sum(col("_nt")).as("_ts"))
    // prior-bucket offsets: a window over histogram rows only
    val wOff = Window.partitionBy("_g").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sums
      .withColumn("_toff", coalesce(sum(col("_ts")).over(wOff), lit(0L)))
      .select("_g", "_b", "_toff")
    // inclusive running sum inside the bounded (group, bucket) slice
    val wRun = Window.partitionBy("_g", "_b").orderBy("_k")
      .rowsBetween(Window.unboundedPreceding, 0)
    out(binned
      .withColumn("_run", sum(col("_nt")).over(wRun))
      .join(offs, Seq("_g", "_b"))
      .withColumn("_cum", col("_toff") + col("_run")))
  }

  /** Deterministic proportional interleave — the "epoch schedule" that
    * orders a mixed corpus so every training prefix carries each
    * source at its corpus proportion (stride scheduling over sources):
    * the row of 1-based within-group rank r (by ascending key) in a
    * group of n_g rows gets `pos = (2r − 1) / (2·n_g) ∈ (0, 1)`, and
    * reading in pos order interleaves the groups proportionally — no
    * "all of source A, then all of B" pathology, no RNG. `pos` is one
    * IEEE division of exact integers (engine-reproducible); readers
    * range-partition on it rather than materializing a global sort.
    * Keys must be unique within their group (they are ids); null
    * key/group rows drop. Output: `(groupCol, keyCol, rank, pos)` —
    * ids only, join back for payloads.
    *
    * Scale shape: within-group ranks come from a TWO-LEVEL bucketed
    * prefix (the percentRank design, on integer keys): key-range
    * bucket counts per group reduce map-side, per-group offsets ride a
    * window over the COUNT table (≤ groups×buckets rows — histogram
    * rows, never the corpus), and `row_number` runs per (group,
    * bucket) — bounded partitions, so no per-group window ever sees a
    * whole group.
    */
  def epochSchedule(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      buckets: Int = 1024
  ): DataFrame = {
    require(buckets > 0, s"epochSchedule: buckets must be positive, got $buckets")
    val base = df
      .select(col(groupCol).as("_g"), col(keyCol).cast("long").as("_k"))
      .filter(col("_g").isNotNull && col("_k").isNotNull)
    val out = (g: Column, k: Column, rank: Column, pos: Column) => Seq(
      g.as(groupCol), k.as(keyCol), rank.as("rank"), pos.as("pos"))
    withinGroupRanks(base, buckets) match {
      case None =>
        base.select(out(col("_g"), col("_k"), lit(0L), lit(0.0)): _*).limit(0)
      case Some(ranked) =>
        ranked.select(out(col("_g"), col("_k"), col("_rank"),
          (lit(2L) * col("_rank") - 1L).cast("double") /
            (lit(2L) * col("_ng")).cast("double")): _*)
    }
  }

  /** Deterministic global training-order permutation: every row gets a
    * unique 1-based `pos`, the row's rank under the total order
    * (FNV-1a(salt ++ ':' ++ key) signed-ascending, then key) — the
    * document-level corpus shuffle of training prep, reproducible by
    * any engine (re-running, re-partitioning, or re-reading yields the
    * SAME permutation, unlike `orderBy(rand())`). Change `salt` for an
    * independent epoch order.
    *
    * Scale shape — the two-level rank, with the hash itself as the
    * balancer: rows bucket by the hash's high 10 bits (monotone in
    * signed order, uniform by construction — the sort key IS a hash,
    * so bucket sizes are balanced at any corpus skew, and unlike
    * [[withinGroupRanks]] no min/max pre-pass is needed to find the
    * key range). Per-bucket counts prefix-sum into offsets over ≤1024
    * histogram rows; `row_number` runs per bucket ordered by (hash,
    * key) — ties between colliding hashes break by key, so the
    * permutation is total and engine-reproducible. No task ever sorts
    * the whole corpus; nothing wider than the (bucket, count)
    * histogram crosses the driver.
    */
  def deterministicShuffle(
      df: DataFrame,
      keyCol: String,
      salt: String = "graft"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.ColumnBridge
    // salt as PREFIX, unlike the membership samplers' suffix: FNV-1a
    // folds bytes left-to-right, so a suffix only perturbs the last
    // multiply — the hash's HIGH bits (which this operator sorts by)
    // barely move, and two salts would draw near-identical orders. A
    // prefix avalanches through every subsequent byte. (The samplers
    // keep the suffix: they read the LOW bits, which the final
    // multiply does scramble.)
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(
        concat(lit(salt + ":"), col(keyCol).cast("string")))))
    // high 10 bits of the SIGNED hash, shifted into [0, 1024): monotone
    // in signed order, so bucket-offset + within-bucket rank = global rank
    val withH = df.withColumn("_h", h)
      .withColumn("_b", shiftright(col("_h"), 54) + lit(512L))
    val cnts = withH.groupBy("_b").agg(count(lit(1)).as("_c"))
    val wOff = Window.orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select("_b", "_off")
    val wRn = Window.partitionBy("_b").orderBy(col("_h"), col(keyCol))
    withH
      .withColumn("_rn", row_number().over(wRn).cast("long"))
      .join(offs, Seq("_b"))
      .withColumn("pos", col("_off") + col("_rn"))
      .drop("_h", "_b", "_rn", "_off")
  }

  /** UniMax per-group budget allocation (public algorithm: Chung,
    * Garcia, Roberts et al. 2023, "UniMax: Fairer and More Effective
    * Language Sampling for Large-Scale Multilingual Pretraining"):
    * spread a total token budget across groups (languages, domains)
    * so no group repeats more than `maxEpochs` passes over its own
    * data and the leftover budget spreads evenly. Visiting groups from
    * SMALLEST token count upward (ties by group name — a total order),
    * each group gets `min(n_g · maxEpochs, remaining // groups_left)`;
    * what a small group cannot absorb rolls forward to the larger
    * ones. Integer arithmetic throughout (floor division), so any
    * engine replays the allocation bit-for-bit (the driver gate's
    * DuckDB oracle walks the same waterfill as a recursive CTE).
    *
    * Output: one row per group — `(groupCol, n_tokens, budget)`.
    *
    * Scale shape: the only corpus-scale stage is the map-side-combined
    * per-group token sum (result ≤ #groups rows — language/domain
    * cardinality, metadata scale); the waterfill itself is a
    * sequential fold over those rows on the driver, the same
    * collect-the-histogram discipline as [[mixToTarget]] /
    * [[temperatureMix]]. Apply the returned budgets with
    * [[tokenQuotaPerGroup]]-style cumulative cuts to materialize the
    * mix.
    */
  def unimaxBudgets(
      df: DataFrame,
      groupCol: String,
      tokensCol: Column,
      totalBudget: Long,
      maxEpochs: Long
  ): DataFrame = {
    require(totalBudget > 0, s"unimaxBudgets: totalBudget must be positive, got $totalBudget")
    require(maxEpochs > 0, s"unimaxBudgets: maxEpochs must be positive, got $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(col(groupCol).cast("string").as("_g"), tokensCol.cast("long").as("_nt"))
      .filter(col("_g").isNotNull && col("_nt").isNotNull)
      .groupBy("_g").agg(sum(col("_nt")).as("_n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (g, n) => (n, g) }
    val total = counts.length
    var rem = totalBudget
    val rows = counts.zipWithIndex.map { case ((g, n), i) =>
      // epoch cap with overflow guard: at petabyte scale n·E can pass
      // Long.MaxValue; the cap then never binds, which is the intent
      val epochCap =
        if (maxEpochs != 0L && n > Long.MaxValue / maxEpochs) Long.MaxValue
        else n * maxEpochs
      val share = rem / (total - i)
      val b = math.min(epochCap, share)
      rem -= b
      (g, n, b)
    }
    rows.toSeq.toDF(groupCol, "n_tokens", "budget")
  }

  /** Curriculum ordering — the easy-to-hard training schedule over a
    * difficulty score: rows band into `nBands` EXACT score quantiles
    * (the [[Profile.quantileBuckets]] thresholds — any engine replays
    * the cut), bands train in ascending order, and WITHIN a band the
    * order is a deterministic shuffle (FNV-1a of the id, salted) so no
    * band leaks its score ordering into the batch stream. `pos` is the
    * 1-based global training position: band offsets stack the
    * within-band shuffled ranks, so the full order equals ORDER BY
    * (band, signed-hash, id) — one SQL window for the oracle, replayed
    * here without one.
    *
    * Output: `(<idCol>, band BIGINT, pos BIGINT)`; null ids/scores
    * drop. Change `salt` for an independent within-band order (band
    * membership is salt-free — it's the score cut).
    *
    * Scale shape: the [[deterministicShuffle]] two-level design,
    * PARTITIONED BY BAND — per-(band, high-10-hash-bits) `row_number`
    * over bounded partitions, within-band offsets from a window over
    * the ≤ nBands·1024 count rows, band offsets over ≤ nBands rows
    * (both histogram-scale), and the quantile thresholds ride
    * [[Profile.quantileBuckets]]'s distributed selection. No stage
    * funnels the corpus through one task.
    */
  def curriculumOrder(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      nBands: Int,
      salt: String = "curr"
  ): DataFrame = {
    require(nBands >= 2, s"curriculumOrder: need nBands >= 2, got $nBands")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.ColumnBridge
    val banded = Profile.quantileBuckets(
        df.select(col(idCol), col(scoreCol))
          .filter(col(idCol).isNotNull && col(scoreCol).isNotNull),
        scoreCol, nBands, outCol = "band")
      .filter(col("band").isNotNull)
    // salt as PREFIX for the same reason deterministicShuffle prefixes:
    // this operator sorts by the hash's HIGH bits
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(
        concat(lit(salt + ":"), col(idCol).cast("string")))))
    val withH = banded.withColumn("_h", h)
      .withColumn("_hb", shiftright(col("_h"), 54) + lit(512L))
    val cnts = withH.groupBy(col("band"), col("_hb"))
      .agg(count(lit(1)).as("_c"))
    val wOff = Window.partitionBy(col("band")).orderBy(col("_hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select(col("band"), col("_hb"), col("_off"))
    val bandTot = cnts.groupBy(col("band")).agg(sum(col("_c")).as("_bc"))
    val wBand = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandOffs = bandTot
      .withColumn("_boff", coalesce(sum(col("_bc")).over(wBand), lit(0L)))
      .select(col("band"), col("_boff"))
    val wRn = Window.partitionBy(col("band"), col("_hb"))
      .orderBy(col("_h"), col(idCol))
    withH
      .withColumn("_rn", row_number().over(wRn).cast("long"))
      .join(offs, Seq("band", "_hb"))
      .join(broadcast(bandOffs), Seq("band"))
      .withColumn("pos", col("_boff") + col("_off") + col("_rn"))
      .select(col(idCol), col("band"), col("pos"))
  }

  /** Within-group 1-based ranks by ascending integer key, TWO-LEVEL
    * bucketed (the percentRank design): key-range bucket counts per
    * group reduce map-side, per-group offsets ride a window over the
    * COUNT table (≤ groups×buckets rows — histogram rows, never the
    * corpus), and `row_number` runs per (group, bucket) — bounded
    * partitions, so no task ever windows a whole group. Input must
    * provide non-null `_g` (group) and `_k` (long key, unique within
    * group — or unique under `(_k, tieCols…)` when tie-break columns
    * are supplied: ties on `_k` land in one bucket by construction, so
    * the within-bucket `row_number` ordered by `(_k, tieCols…)` stays
    * a total order); any other columns ride through untouched (no
    * join-back needed). Output adds `_rank` and the group size `_ng`.
    * None on an empty input (no key range to bucket).
    */
  private[graft] def withinGroupRanks(
      base: DataFrame,
      buckets: Int,
      tieCols: Seq[String] = Nil
  ): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val b = base.agg(min(col("_k")).as("mn"), max(col("_k")).as("mx")).head()
    if (b.isNullAt(0)) return None
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    // the span drives every bucket assignment below; a >= 2^63 key span
    // (arbitrary user-cast longs reach here via rankCorrelationByGroup)
    // would wrap and silently corrupt bucket order, hence ranks — refuse
    // loudly instead (the tripwire convention)
    val span =
      try Math.subtractExact(mx, mn)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"withinGroupRanks: key span [$mn, $mx] overflows int64 — the " +
            "bucket arithmetic would corrupt rank order silently; rescale " +
            "or monotonically remap the keys into a < 2^63 span first")
      }
    // integer bucket width (ceil): bins stay in [0, buckets), assignment
    // is exact integer arithmetic — no FP boundary jitter. The min goes
    // in as lit(mn), not string interpolation: Long.MinValue has no SQL
    // long literal (the parser widens 9223372036854775808 to DECIMAL)
    val width = math.max(1L, span / buckets + 1)
    val binned = base.withColumn("_kk", col("_k") - lit(mn))
      .withColumn("_b", expr(s"_kk div ${width}L"))
    val cnts = binned.groupBy("_g", "_b").agg(count(lit(1)).as("_c"))
    // both windows share the one exchange on _g; only histogram rows flow
    val wOff = Window.partitionBy("_g").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_ng", sum(col("_c")).over(Window.partitionBy("_g")))
      .select(col("_g"), col("_b"), col("_off"), col("_ng"))
    val wRn = Window.partitionBy("_g", "_b")
      .orderBy(col("_k") +: tieCols.map(col): _*)
    Some(binned.withColumn("_rn", row_number().over(wRn).cast("long"))
      .join(offs, Seq("_g", "_b"))
      .withColumn("_rank", col("_off") + col("_rn")) // 1-based
      .select(base.columns.map(col) ++ Seq(col("_rank"), col("_ng")): _*))
  }
}
