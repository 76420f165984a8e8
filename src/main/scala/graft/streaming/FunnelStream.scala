package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming funnel progress — the continuous face of
 * [[graft.operators.Funnel]]: per-user keyed state holds `(depth,
 * lastTs)` and each micro-batch advances it through the step list with
 * the SAME strict min-chain rule as the batch operator (sort the
 * batch's events, advance on the first step-matching event with ts
 * strictly past the last advance). Emits one row per user whose depth
 * CHANGED in the batch — downstream can aggregate reach or alert on
 * completions.
 *
 * Semantics note (inherent to incremental processing): events arriving
 * across batch boundaries are folded in arrival order. Within a batch
 * the sort makes the fold order-free; an event that arrives AFTER a
 * later-timestamped event already advanced the state cannot
 * retroactively produce an earlier chain (the batch operator, seeing
 * all history, could). With event-time-ordered sources (or any
 * at-least-once replay of an ordered log) the two agree exactly —
 * spec-pinned.
 *
 * Scale notes: state per key is two longs + an int; the state store
 * shuffles by user once per batch; work per batch ∝ batch events.
 */
object FunnelStream {

  final case class FEvent(userId: Long, ts: Long, eventType: String)
  final case class FState(depth: Int, lastTs: Long)
  final case class Progress(userId: Long, depth: Int, lastTs: Long)

  def progress(
      events: Dataset[FEvent],
      steps: Seq[String]
  ): Dataset[Progress] = {
    require(steps.nonEmpty, "funnelStream: steps must be non-empty")
    require(steps.distinct.length == steps.length,
      "funnelStream: repeated step types are ambiguous")
    import events.sparkSession.implicits._
    val k = steps.length
    val stepIdx = steps.zipWithIndex.toMap
    events
      .filter(e => e.eventType != null && stepIdx.contains(e.eventType))
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FState, Progress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[FState]) =>
          val before = state.getOption.getOrElse(FState(0, Long.MinValue))
          var cur = before
          // same fold as Funnel.depths: ascending (ts, type), advance on
          // a current-step match strictly past the last advance
          it.toSeq.sortBy(e => (e.ts, e.eventType)).foreach { e =>
            if (cur.depth < k && e.eventType == steps(cur.depth) &&
              (cur.depth == 0 || e.ts > cur.lastTs))
              cur = FState(cur.depth + 1, e.ts)
          }
          if (cur == before) Iterator.empty
          else {
            state.update(cur)
            Iterator(Progress(userId, cur.depth, cur.lastTs))
          }
      }
  }

  /** Convenience: DataFrame-in (userCol, tsCol, typeCol). Null
    * users/timestamps drop up front — the batch operator's rule; the
    * typed FEvent has primitive fields, so an unfiltered null would
    * kill the query at deserialization. A TimestampType ts converts at
    * MICROSECOND precision (a bare long cast would truncate timestamps
    * to seconds and stall strict `>` chains on sub-second funnels).
    */
  def progressDF(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.types.TimestampType
    val tsExpr = df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    progress(
      df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
        .select(col(userCol).cast("long").as("userId"),
          tsExpr.as("ts"),
          col(typeCol).as("eventType")).as[FEvent],
      steps).toDF()
  }
}
