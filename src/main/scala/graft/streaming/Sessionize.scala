package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Gap-based sessionization with explicit keyed state —
 * `flatMapGroupsWithState` over a user-keyed stream. The batch analogue
 * (window/lag) is the `sessionize` gate query; this is the streaming form
 * with real state-store semantics: per-user state holds the open
 * session, an event-time timeout closes it when the gap elapses.
 *
 * Scale notes: state per key is O(1) (one open session: start, last-seen,
 * count); the state store shuffles by user key once; timeouts garbage-
 * collect idle keys, so state size tracks ACTIVE users, not history.
 */
object Sessionize {

  final case class Event(userId: Long, ts: Timestamp)
  final case class SessionState(start: Long, lastSeen: Long, events: Long)
  final case class ClosedSession(
      userId: Long, startMs: Long, endMs: Long, events: Long)

  /** Close a session after `gapMs` of silence (processing-time timeout —
    * the reference has no watermark notion, SURVEY §4.2; an event-time
    * variant would swap the timeout mode and use withWatermark).
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.start, s.lastSeen, s.events))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t), events = s.events + 1))
                case Some(s) =>
                  closed ::= ClosedSession(userId, s.start, s.lastSeen, s.events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Convenience: DataFrame-in (userCol, tsCol) → closed sessions. */
  def sessionsDF(df: DataFrame, userCol: String, tsCol: String, gapMs: Long): DataFrame = {
    import df.sparkSession.implicits._
    sessions(
      df.select(col(userCol).cast("long").as("userId"), col(tsCol).cast("timestamp").as("ts"))
        .as[Event],
      gapMs
    ).toDF()
  }
}
