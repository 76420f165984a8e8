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
    * exactly `leftTs` ± the same gap). Composed from the two
    * directional merges — two key shuffles instead of one, but each is
    * the same payload-once tagged union; the arbitration is a narrow
    * per-row comparison of the two candidate structs. `tolerance`
    * bounds the distance on both sides.
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
    val back = joinDirectional(left, right, keys, leftTs, rightTs,
      payloadCols, tieBreak, tolerance, forward = false)
      .withColumnRenamed("matched", "_mb")
    val fwd = joinDirectional(left, right, keys, leftTs, rightTs,
        payloadCols, tieBreak, tolerance, forward = true)
      .select((keys.map(col) :+ col(leftTs) :+ col("matched").as("_mf")): _*)
    // re-join on (keys, leftTs): both sides carry one row per original
    // left row — but only if (keys, leftTs) is unique; duplicated left
    // rows would cross-match. Guard by folding the forward pass's match
    // per (keys, ts): all duplicates of a left row get the same answer
    // anyway (the merge is a pure function of (keys, ts)).
    val joinCols = keys :+ leftTs
    val fwdDistinct = fwd.groupBy(joinCols.map(col): _*)
      .agg(first(col("_mf")).as("_mf"))
    // both distances are nonnegative BY DIRECTION (backward matches at
    // _t <= leftTs, forward at _t >= leftTs), so plain subtraction in
    // the ts column's own type compares exactly — numeric ts diff as
    // numbers, TIMESTAMP diff as microsecond intervals; no lossy casts
    val bdist = col(leftTs) - col("_mb._t")
    val fdist = col("_mf._t") - col(leftTs)
    val leftCols = left.columns.toSeq
    back.join(fwdDistinct, joinCols)
      .withColumn("matched",
        when(col("_mb").isNull, col("_mf"))
          .when(col("_mf").isNull, col("_mb"))
          .when(fdist < bdist, col("_mf"))
          .otherwise(col("_mb")))
      .select(leftCols.map(col) :+ col("matched"): _*)
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

    // backward walks time ascending (last right seen = most recent
    // before the left row); forward walks DESCENDING (last right seen =
    // earliest at-or-after). In both, right sorts before left at equal
    // ts (inclusive match) and the greatest tieBreak among same-ts right
    // rows sorts last, so the running last() leaves it as the winner.
    val tsOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_match", last(col("_m"), ignoreNulls = true).over(w))
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
