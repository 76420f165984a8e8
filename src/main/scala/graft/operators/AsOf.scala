package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of (point-in-time) join — for each left row, the single nearest
 * right row on the chosen side of `leftTs` in the same key group. The
 * temporal primitive Spark lacks natively:
 *  - [[joinBackward]]: most recent right row with `rightTs <= leftTs`
 *    (feature lookup at event time, price as-of trade, state as-of
 *    observation);
 *  - [[joinForward]]: next right row with `rightTs >= leftTs` (next
 *    event after an action — attribution, time-to-conversion,
 *    next-maintenance lookup).
 *
 * Spark-first shape — the tagged-union merge, NOT a range join: a
 * `l.key = r.key AND r.ts <= l.ts` join explodes to every earlier right
 * row per left row (O(n·m) per key) before an argmax prunes it. Instead
 * both sides union into one stream, shuffle ONCE on the keys, sort per
 * partition by (ts, side, tie), and a running `last(payload,
 * ignoreNulls)` window carries the nearest right payload into each left
 * row — per-key work is one ordered merge, O(n+m) after the sort, and
 * payloads cross the wire exactly once. (A sort-based Window is
 * deliberate here — an as-of join IS a per-key ordered merge; the
 * "no Window" rule in the dedup/top-k paths targets windows that
 * replace partial-aggregable reductions.) The forward join is the SAME
 * merge run in descending timestamp order — one shared core, two
 * directions.
 *
 * Ties: a right row at exactly `leftTs` matches (inclusive — right
 * sorts before left at equal ts); among right rows sharing (keys, ts)
 * the greatest `tieBreak` wins (it sorts last, so the running `last()`
 * overwrites its predecessors), making results deterministic on
 * duplicate-timestamp data. `tolerance` (same unit as the ts columns'
 * difference): matches farther than `tolerance` from `leftTs` become
 * null — the bounded-staleness (backward) / bounded-lookahead (forward)
 * guard.
 */
object AsOf {

  /** Left columns + a `matched` struct (`_t` = the matched right ts,
    * plus `payloadCols`), or null `matched` when no right row precedes
    * the left row (within `tolerance`). `payloadCols` defaults to every
    * right column except keys and ts.
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String] = Seq.empty,
      tieBreak: Option[String] = None,
      tolerance: Option[Column] = None
  ): DataFrame =
    joinDirectional(left, right, keys, leftTs, rightTs, payloadCols,
      tieBreak, tolerance, forward = false)

  /** Forward as-of: left columns + the EARLIEST right row with
    * `rightTs >= leftTs` per key group (null `matched` when none, or
    * when the match is farther ahead than `tolerance`). Same merge core
    * as [[joinBackward]] with the ordering reversed.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String] = Seq.empty,
      tieBreak: Option[String] = None,
      tolerance: Option[Column] = None
  ): DataFrame =
    joinDirectional(left, right, keys, leftTs, rightTs, payloadCols,
      tieBreak, tolerance, forward = true)

  /** Nearest as-of: the right row closest to `leftTs` in EITHER
    * direction (backward wins exact-distance ties — the convention that
    * keeps pure-lookup semantics stable when a right row sits at
    * exactly `leftTs` ± the same gap). ONE key shuffle: both directional
    * merges run as two windows over the SAME tagged union — identical
    * `partitionBy`, opposite `orderBy` — so Spark plans one Exchange
    * feeding two Sort+Window passes (no second shuffle, no
    * recombination join; the earlier composed form paid two union
    * shuffles plus a join — and its inner equi-join dropped left rows
    * with null keys/ts, which this form preserves like the directional
    * joins do). The arbitration is a narrow per-row comparison of the
    * two candidate structs. `tolerance` bounds the distance on both
    * sides.
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String] = Seq.empty,
      tieBreak: Option[String] = None,
      tolerance: Option[Column] = None
  ): DataFrame = {
    val (unioned, leftCols) =
      taggedUnion(left, right, keys, leftTs, rightTs, payloadCols, tieBreak)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_mb", last(col("_m"), ignoreNulls = true).over(wb))
      .withColumn("_mf", last(col("_m"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) => carried
        .withColumn("_mb", when(col("_mb._t") >= col("_t") - tol, col("_mb")))
        .withColumn("_mf", when(col("_mf._t") <= col("_t") + tol, col("_mf")))
      case None => carried
    }
    // both distances are nonnegative BY DIRECTION (backward matches at
    // _t <= leftTs, forward at _t >= leftTs), so plain subtraction in
    // the ts column's own type compares exactly — numeric ts diff as
    // numbers, TIMESTAMP diff as microsecond intervals; no lossy casts.
    // Null-ts left rows have no position in time: the leading isNotNull
    // guard forces a null match (without it the desc window's
    // nulls-last placement hands them the minimum-ts right row via _mf)
    // — row preserved, matched null, same convention as the directional
    // joins.
    val bdist = col("_t") - col("_mb._t")
    val fdist = col("_mf._t") - col("_t")
    bounded
      .withColumn("matched",
        when(col("_t").isNotNull,
          when(col("_mb").isNull, col("_mf"))
            .when(col("_mf").isNull, col("_mb"))
            .when(fdist < bdist, col("_mf"))
            .otherwise(col("_mb"))))
      .select(leftCols.map(n => col(s"_l.$n").as(n)) :+ col("matched"): _*)
  }

  /** The tagged union both directions merge over: right rows carry their
    * match struct in `_m`, left rows carry their full row in `_l`; `_t`
    * is the event time, `_side` orders right before left at equal ts
    * (inclusive match), `_tie` makes duplicate-timestamp right rows
    * deterministic. Returns (union, left column names).
    */
  private def taggedUnion(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      tieBreak: Option[String]
  ): (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val payload =
      if (payloadCols.nonEmpty) payloadCols
      else right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq

    val matchStruct = struct(
      (col(rightTs).as("_t") +: payload.map(col)): _*)
    val r0 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_t"),
        lit(0).as("_side"),
        tieBreak.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("_tie"),
        matchStruct.as("_m")): _*)
    val mType = r0.schema("_m").dataType

    val leftCols = left.columns.toSeq
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_t"),
        lit(1).as("_side"),
        lit(Long.MaxValue).as("_tie"),
        lit(null).cast(mType).as("_m"),
        struct(leftCols.map(col): _*).as("_l")): _*)
    val r = r0.withColumn("_l",
      lit(null).cast(StructType(left.schema.fields)))
    (l.unionByName(r), leftCols)
  }

  /** Point-in-time SNAPSHOT: the latest row per key at or before `at` —
    * the one-sided companion to [[joinBackward]] ("state of the world
    * at T" over a changelog: latest feature row per entity, last known
    * status per device, the training-set freeze at a cutoff).
    *
    * Shape: the `tsCol <= at` filter pushes to the scan (on a
    * time-partitioned table this prunes every partition past T), then
    * ONE argmax per key through [[graft.plans.TopKAggregate]]'s bounded
    * heap at k=1 — a TypedImperativeAggregate, so the plan is an
    * ObjectHashAggregate with map-side partial combine (a plain
    * `max(struct)` has an immutable struct buffer and silently falls
    * back to SortAggregate): each input partition reduces to ONE
    * candidate per key before the only shuffle, with no window and no
    * sort of any kind. Determinism: the heap's struct comparison is
    * lexicographic (ts, then tieBreak), so with `tieBreak` unique per
    * (key, ts) — e.g. an event id — the winner is total-order defined
    * and payload columns never arbitrate.
    */
  def snapshotAt(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      at: Column,
      tieBreak: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty, "snapshotAt requires key columns")
    graft.plans.TopKAggregate.register(df.sparkSession)
    val ordered = col(tsCol).as("_t") +: col(tieBreak).as("_tb") +:
      payloadCols.map(c => col(c).as(c))
    df.filter(col(tsCol) <= at)
      .groupBy(keys.map(col): _*)
      .agg(element_at(
        call_function("graft_topk", struct(ordered: _*), lit(1)), 1).as("_m"))
      .select(
        keys.map(col) ++
          (col("_m._t").as(tsCol) +: col("_m._tb").as(tieBreak) +:
            payloadCols.map(c => col(s"_m.$c").as(c))): _*)
  }

  private def joinDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      tieBreak: Option[String],
      tolerance: Option[Column],
      forward: Boolean
  ): DataFrame = {
    val (unioned, leftCols) =
      taggedUnion(left, right, keys, leftTs, rightTs, payloadCols, tieBreak)
    // backward walks time ascending (last right seen = most recent
    // before the left row); forward walks DESCENDING (last right seen =
    // earliest at-or-after). In both, right sorts before left at equal
    // ts (inclusive match) and the greatest tieBreak among same-ts right
    // rows sorts last, so the running last() leaves it as the winner.
    val tsOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-ts left rows have no position in time → null match. Backward
    // gets this for free (asc sorts nulls FIRST: nothing precedes), but
    // forward's desc order sorts nulls LAST, where the running last()
    // would hand them the minimum-ts right row — guard explicitly.
    val carried = unioned
      .withColumn("_match",
        when(col("_t").isNotNull, last(col("_m"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) if forward =>
        carried.withColumn("_match",
          when(col("_match._t") <= col("_t") + tol, col("_match")))
      case Some(tol) =>
        carried.withColumn("_match",
          when(col("_match._t") >= col("_t") - tol, col("_match")))
      case None => carried
    }
    bounded.select(
      leftCols.map(n => col(s"_l.$n").as(n)) :+ col("_match").as("matched"): _*)
  }
}
