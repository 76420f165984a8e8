package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Ordered-funnel analysis over an event log — the classic product
 * analytics question ("how many users viewed, then clicked, then
 * purchased, in that order?") as one aggregation.
 *
 * Semantics are the STRICT-progress min-chain: t₁ = min ts of step-1
 * events; tᵢ = min ts of step-i events with ts > tᵢ₋₁; a user's depth
 * is the number of non-null tᵢ. Min-based, so the result is
 * deterministic under any partitioning with NO tie-break rule needed —
 * an equal-timestamp next-step event does not advance (strict `>`),
 * and the chain is order-free within each per-step event set.
 *
 * Scale shape: the filter to the k step types pushes to the scan; ONE
 * `groupBy(user)` collects k per-step timestamp lists (map-side
 * combined — only step events move, as (user, ts) pairs); the chain is
 * then a narrow `array_min`/`filter` fold per user. No window, no
 * per-user sort task, no per-step shuffle. Per-user state is bounded
 * by that user's step-event count; `maxEventsPerUser` caps it in the
 * aggregate itself (the same discipline as the dedup postings caps).
 */
object Funnel {

  /** Per-user funnel depth: `(user, depth)` with depth in [0, k] —
    * users with NO step event at all produce no row (they never enter
    * the filtered scan); left-join against the user dimension if zero
    * rows must surface.
    *
    * `maxEventsPerUser` is the hot-user guard: when set, each user
    * keeps only the EARLIEST `cap` events of each step inside a
    * bounded `graft_bottomk` heap — per-user aggregation state is then
    * ≤ k·cap rows at every stage (map-side partials included), so one
    * 10⁶-event bot cannot blow up its task. Semantics under the cap
    * are a strict LOWER BOUND on the true depth, and EXACT for every
    * user whose per-step event counts are all ≤ cap: whenever the
    * capped chain advances, the kept earliest-`cap` set provably
    * contains min{ts > tᵢ₋₁} (anything smaller than a kept element is
    * itself kept), so the chain advances with the TRUE tᵢ — the only
    * possible error is a stall at a step where the user had > cap
    * events, all of whose kept timestamps are ≤ tᵢ₋₁.
    */
  def depths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxEventsPerUser: Option[Int] = None
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.length == steps.length,
      "funnel: repeated step types are ambiguous — rename upstream")
    maxEventsPerUser.foreach(c => require(c >= 1,
      s"funnel: maxEventsPerUser must be >= 1, got $c"))
    val k = steps.length
    val stepArr = array(steps.map(lit): _*)
    // ONE sorted fold, linear in the user's event count. (An earlier
    // per-step array_min/filter chain nested each step's whole subtree
    // inside the next filter lambda — interpreted HOFs get no CSE, so
    // per-user cost multiplied across steps; a bot user with 1000
    // events per step of a 5-step funnel was ~10^12 comparisons.)
    // The fold IS the min-chain: ascending (ts, type) order means the
    // first step-i event with ts strictly past t_{i-1} is exactly
    // min{ts > t_{i-1}}, and equal-ts events are skipped by the strict
    // `>` whatever their sort position — order-insensitive, so no tie
    // column is needed. Null users/timestamps drop up front: a null
    // user is not a user, a null timestamp can't order.
    val evs = sort_array(collect_list(struct(
      col(tsCol).as("t"), col(typeCol).as("et"))))
    val tsDataType = events.select(col(tsCol)).schema.head.dataType
    val init = struct(lit(0).as("d"), lit(null).cast(tsDataType).as("last"))
    val fold = aggregate(
      col("_ev"),
      init,
      (acc, e) => when(
        acc.getField("d") < k &&
          e.getField("et") === element_at(stepArr, acc.getField("d") + 1) &&
          (acc.getField("d") === 0 || e.getField("t") > acc.getField("last")),
        struct((acc.getField("d") + 1).as("d"), e.getField("t").as("last")))
        .otherwise(acc),
      acc => acc.getField("d").cast(LongType))
    val stepEvents = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(steps: _*))
    val grouped = maxEventsPerUser match {
      case None =>
        stepEvents
          .groupBy(col(userCol).as("user"))
          .agg(evs.as("_ev"))
      case Some(cap) =>
        // bounded per-(user, step) heaps: each graft_bottomk aggregate
        // holds at most `cap` (t) rows per user AT EVERY STAGE (the
        // heap partial-aggregates map-side), then the kept slices
        // reassemble into the same sorted (t, et) list the fold expects
        graft.plans.TopKAggregate.register(events.sparkSession)
        val perStep = steps.zipWithIndex.map { case (s, i) =>
          call_function("graft_bottomk",
            when(col(typeCol) === s, struct(col(tsCol).as("t"))),
            lit(cap)).as(s"_e$i")
        }
        stepEvents
          .groupBy(col(userCol).as("user"))
          .agg(perStep.head, perStep.tail: _*)
          .select(col("user"), sort_array(concat(
            steps.zipWithIndex.map { case (s, i) =>
              transform(col(s"_e$i"),
                e => struct(e.getField("t").as("t"), lit(s).as("et")))
            }: _*)).as("_ev"))
    }
    grouped.select(col("user"), fold.as("depth"))
  }

  /** Funnel reach: exactly one row per step — `(step 1-based,
    * step_name, users)` where `users` counts users whose depth reached
    * that step. Steps nobody reached report 0 (the row never vanishes).
    */
  def reach(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxEventsPerUser: Option[Int] = None
  ): DataFrame = {
    val d = depths(events, userCol, tsCol, typeCol, steps, maxEventsPerUser)
    val sums = steps.indices.map(i =>
      sum(when(col("depth") >= i + 1, 1L).otherwise(0L)).as(s"_s$i"))
    // rows built with Column APIs, not a selectExpr string — step names
    // are user data and SQL-literal escaping rules are not ours to
    // reimplement (an apostrophe or trailing backslash would corrupt
    // the parse or the name)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        coalesce(col(s"_s$i"), lit(0L)).cast(LongType).as("users"))
    }
    d.agg(sums.head, sums.tail: _*)
      .select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.step"), col("_r.step_name"), col("_r.users"))
  }

  /** Cohort retention over an event log: users are cohorted by the
    * PERIOD of their first activity (period = ts div periodLength —
    * integer division TRUNCATING TOWARD ZERO, matching SQL `//`; for
    * the epoch-based nonnegative timestamps this is floor, and there
    * are no calendar rules to disagree on), and each (cohort, offset)
    * cell counts the cohort's users active `offset` periods later.
    * Output: `(cohort_period, offset, users)` with offset 0 = the
    * cohort size itself. Null users/timestamps are dropped up front.
    *
    * Scale shape: one distinct over (user, period) — the activity
    * matrix, map-side combined, 16 bytes/row; the cohort assignment is
    * a min-aggregate re-join on the user id (AQE broadcasts the cohort
    * side when it fits); the final cell count is a count over the
    * already-distinct matrix, no countDistinct expansion.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodLength: Long
  ): DataFrame = {
    require(periodLength > 0, "cohortRetention: periodLength must be positive")
    val uw = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"),
        expr(s"`$tsCol` div ${periodLength}L").as("w"))
      .distinct()
    val cohort = uw.groupBy("user").agg(min(col("w")).as("cw"))
    uw.join(cohort, Seq("user"))
      .groupBy(col("cw").as("cohort_period"), (col("w") - col("cw")).as("offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Per-user ROLLING activity: for every (user, active period), the
    * event count inside the trailing `window`-period range — the
    * engagement/burst series per entity (spam-burst detection, active-
    * user windows), computed exactly over integer periods with a RANGE
    * frame, so gaps in activity weigh correctly (a ROWS frame would
    * ignore calendar distance).
    *
    * Scale shape: events compress to per-(user, period) counts FIRST
    * (one map-side-combined aggregate, the only corpus-scale stage);
    * the rolling window runs per user over that user's ACTIVE periods
    * only — bounded by the observation span, not the event count.
    * Output: `(user, period, n_events, rolling)`.
    */
  def rollingUserActivity(
      events: DataFrame,
      userCol: String,
      periodCol: Column,
      window: Int
  ): DataFrame = {
    require(window >= 1, s"rollingUserActivity: window must be >= 1, got $window")
    val w = org.apache.spark.sql.expressions.Window
    val perDay = events
      .select(col(userCol).as("user"), periodCol.cast("long").as("period"))
      .filter(col("user").isNotNull && col("period").isNotNull)
      .groupBy("user", "period").agg(count(lit(1)).as("n_events"))
    perDay.withColumn("rolling",
      sum(col("n_events")).over(
        w.partitionBy("user").orderBy("period")
          .rangeBetween(-(window - 1).toLong, 0L)))
  }

  /** Top-k most frequent length-`n` event paths (consecutive event-type
    * sequences per user, ordered by `(tsCol, tieCol)` — pass a unique
    * tie column so equal timestamps order identically everywhere).
    * Users with fewer than `n` events contribute nothing. Output:
    * `(path, cnt)`, space-joined types, ties at the cut broken by path.
    *
    * Scale shape: one `groupBy(user)` (map-side combined collect), the
    * native WordShingles pass over each type sequence, a
    * partial-aggregated path count, and a `TakeOrdered` top-k — no
    * global sort materializes. Per-user state is that user's event-type
    * list; cap pathological users upstream.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String,
      n: Int,
      k: Int
  ): DataFrame = {
    require(n >= 2, "topPaths: a path needs at least 2 steps")
    val seqs = events
      .groupBy(col(userCol).as("user"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tieCol).as("tb"), col(typeCol).as("et")))).as("_ev"))
      .select(transform(col("_ev"), e => e.getField("et")).as("_types"))
    seqs
      // WordShingles joins a SHORT array into one truncated path — drop
      // sub-n users instead (a 1-event "path" is not a path)
      .select(explode(when(size(col("_types")) >= n,
          graft.functions.TextFunctions.shinglesFromTokens(col("_types"), n))
        .otherwise(array().cast("array<string>"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc)
      .limit(k)
  }

  /** First-order (Markov) transition matrix over per-user event
    * sequences — [[topPaths]]' probabilistic sibling: for every
    * consecutive (from, to) event-type pair in each user's
    * (ts, tie)-ordered stream, the transition count and the
    * row-normalized probability `p_ppm = n·10⁶ div Σ_to n` — "after a
    * view, 12% of next actions are purchases" as exact integers.
    * Output: `(from_type, to_type, n BIGINT, p_ppm BIGINT)`.
    *
    * Scale shape: one `groupBy(user)` (map-side combined collect — the
    * [[topPaths]] discipline, per-user state is that user's event
    * types; cap pathological users upstream), a narrow adjacent-pair
    * explode, and a partial-aggregated (from, to) count. The
    * row-normalizing window runs over the ≤K² matrix rows — type-
    * vocabulary metadata, never the event log.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seqs = events
      .groupBy(col(userCol).as("user"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tieCol).as("tb"), col(typeCol).as("et")))).as("_ev"))
      .select(transform(col("_ev"), e => e.getField("et")).as("_types"))
    val pairs = seqs
      .filter(size(col("_types")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_types) - 1), " +
          "i -> struct(element_at(_types, i) AS f, element_at(_types, i + 1) AS t))"))
        .as("_p"))
      .groupBy(col("_p.f").as("from_type"), col("_p.t").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("_rowTotal", sum(col("n")).over(w))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("CAST(n * 1000000 div _rowTotal AS BIGINT)").as("p_ppm"))
  }
}
