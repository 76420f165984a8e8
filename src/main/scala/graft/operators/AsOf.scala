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
