package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization over the event stream with
  * `mapGroupsWithState` — the custom-state shape the reference never needed
  * (its pipeline is stateless, SURVEY.md §2.7 T5) but a training-data
  * pipeline does: per-user activity sessions closed after 30 minutes of
  * event-time inactivity.
  *
  * The batch twin of this operator is the gap-and-island window in
  * `RelationalQueries.q16Sessionize` — identical session counts on a closed
  * input, verified in the spec.
  */
object EventSessions {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)

  final case class SessionState(
      sessionStartMs: Long, lastSeenMs: Long, nEvents: Long, nSessions: Long,
      sessionEvents: Long)

  final case class SessionUpdate(
      user_id: Long, n_sessions: Long, n_events: Long,
      current_session_events: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** One group-state update: count a new session whenever the gap from the
    * previous event exceeds 30 minutes (event-time, within-batch ordering by
    * ts to be deterministic). */
  def updateState(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): SessionUpdate = {
    var st = state.getOption.getOrElse(
      SessionState(0L, Long.MinValue, 0L, 0L, 0L))
    for (e <- events.toSeq.sortBy(_.ts.getTime)) {
      val t = e.ts.getTime
      if (st.lastSeenMs == Long.MinValue || t - st.lastSeenMs > GapMs) {
        st = st.copy(sessionStartMs = t, nSessions = st.nSessions + 1,
          sessionEvents = 0L)
      }
      // sessionEvents persists in state so a session spanning micro-batches
      // keeps its running count
      st = st.copy(lastSeenMs = t, nEvents = st.nEvents + 1,
        sessionEvents = st.sessionEvents + 1)
    }
    state.update(st)
    SessionUpdate(userId, st.nSessions, st.nEvents, st.sessionEvents)
  }

  /** Streaming query: per-user session counts, update mode. */
  def sessionize(events: Dataset[Event])(implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[Event], st: GroupState[SessionState]) =>
          updateState(k, it, st))
  }

  def outputMode: OutputMode = OutputMode.Update()
}
