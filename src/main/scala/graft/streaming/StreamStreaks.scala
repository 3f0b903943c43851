package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.{Date, Timestamp}

/** Streaming twin of [[graft.operators.Streaks.userStreaks]] — the live
  * engagement monitor: per arriving event, the user's day-streak profile
  * updates and the refreshed snapshot is emitted (Append of snapshots;
  * the LATEST snapshot per user equals the batch gate row over the same
  * events — the spec law). State per user is O(1): six longs — current
  * run (start, length), best run (start, length), streak and active-day
  * counters, last seen day. No day set, no history rescan: the
  * gap-and-islands recurrence needs only the frontier.
  *
  * Ordering: within a micro-batch events re-sort by (ts, event_id) (the
  * [[StreamEwma]] discipline); across batches the twin assumes each
  * user's events arrive time-ordered (Kafka key-partitioned order,
  * SURVEY T6). Same-day repeats fold into one active day, exactly as
  * the batch DISTINCT does. */
object StreamStreaks {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  final case class Profile(user_id: Long, active_days: Long,
                           n_streaks: Long, longest_streak: Long,
                           longest_start: Date)
  final case class St(lastDay: Long, runStart: Long, runLen: Long,
                      bestStart: Long, bestLen: Long, nStreaks: Long,
                      activeDays: Long)

  private def epochDay(ts: Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def step(userId: Long, events: Iterator[Ev],
                   state: GroupState[St]): Iterator[Profile] = {
    var st = state.getOption.getOrElse(
      St(Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L))
    val out = Seq.newBuilder[Profile]
    events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val d = epochDay(e.ts)
      if (d > st.lastDay) {
        st =
          if (d == st.lastDay + 1)
            st.copy(lastDay = d, runLen = st.runLen + 1,
              activeDays = st.activeDays + 1)
          else
            st.copy(lastDay = d, runStart = d, runLen = 1L,
              nStreaks = st.nStreaks + 1, activeDays = st.activeDays + 1)
        // strictly-greater keeps the EARLIEST maximal run, matching the
        // batch min(start | len = max_len)
        if (st.runLen > st.bestLen)
          st = st.copy(bestStart = st.runStart, bestLen = st.runLen)
        out += Profile(userId, st.activeDays, st.nStreaks, st.bestLen,
          Date.valueOf(java.time.LocalDate.ofEpochDay(st.bestStart)))
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Profile snapshots over a keyed event stream — one row per NEW
    * active day; the latest row per user is the batch gate row. */
  def profilesOverStream(events: Dataset[Ev]): Dataset[Profile] = {
    implicit val pEnc = Encoders.product[Profile]
    implicit val sEnc = Encoders.product[St]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
  }

  def outputMode: OutputMode = OutputMode.Append()
}
