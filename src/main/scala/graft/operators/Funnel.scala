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
 * by that user's step-event count; for pathological hot users cap
 * upstream (the same discipline as the dedup postings caps).
 */
object Funnel {

  /** Per-user funnel depth: `(user, depth)` with depth in [0, k] —
    * users with NO step event at all produce no row (they never enter
    * the filtered scan); left-join against the user dimension if zero
    * rows must surface.
    */
  def depths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.length == steps.length,
      "funnel: repeated step types are ambiguous — rename upstream")
    val k = steps.length
    val lists = steps.zipWithIndex.map { case (s, i) =>
      collect_list(when(col(typeCol) === s, col(tsCol))).as(s"_l$i")
    }
    val grouped = events
      .filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol).as("user"))
      .agg(lists.head, lists.tail: _*)
    // the chain: min of step-i events after t_{i-1}. A null prev makes
    // the filter predicate null (dropped) -> empty list -> null min, so
    // a broken chain stays broken without special-casing.
    val ts: Seq[Column] = (1 until k).scanLeft(array_min(col("_l0"))) {
      (prev, i) => array_min(filter(col(s"_l$i"), x => x > prev))
    }
    grouped.select(
      col("user"),
      ts.map(t => when(t.isNotNull, 1L).otherwise(0L)).reduce(_ + _).as("depth"))
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
      steps: Seq[String]
  ): DataFrame = {
    val d = depths(events, userCol, tsCol, typeCol, steps)
    val sums = steps.indices.map(i =>
      sum(when(col("depth") >= i + 1, 1L).otherwise(0L)).as(s"_s$i"))
    val stacked = steps.zipWithIndex.map { case (s, i) =>
      s"${i + 1}, '${s.replace("'", "''")}', coalesce(_s$i, 0L)"
    }.mkString(", ")
    d.agg(sums.head, sums.tail: _*)
      .selectExpr(s"stack(${steps.length}, $stacked) AS (step, step_name, users)")
      .select(col("step"), col("step_name"), col("users").cast(LongType))
  }

  /** Cohort retention over an event log: users are cohorted by the
    * PERIOD of their first activity (period = floor(ts / periodLength),
    * exact integer division — no calendar rules to disagree on), and
    * each (cohort, offset) cell counts the cohort's users active
    * `offset` periods later. Output: `(cohort_period, offset, users)`
    * with offset 0 = the cohort size itself.
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
      .select(col(userCol).as("user"),
        expr(s"$tsCol div ${periodLength}L").as("w"))
      .distinct()
    val cohort = uw.groupBy("user").agg(min(col("w")).as("cw"))
    uw.join(cohort, Seq("user"))
      .groupBy(col("cw").as("cohort_period"), (col("w") - col("cw")).as("offset"))
      .agg(count(lit(1)).as("users"))
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
}
