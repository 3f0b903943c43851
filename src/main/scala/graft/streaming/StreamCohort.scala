package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import java.time.{DayOfWeek, LocalDate, ZoneOffset}
import java.time.temporal.TemporalAdjusters

/** Streaming twin of [[graft.operators.Cohort.cohortRetention]] — the
  * deployment shape of retention analytics: as activity events arrive,
  * emit one INCREMENT row the first time each user is active in each
  * week, carrying that user's cohort week and the week offset. Summing
  * increments per (cohort, offset) reproduces the batch triangle's
  * distinct-user counts — without ever re-scanning history (the batch
  * query's `countDistinct` becomes first-seen state).
  *
  * State per user: the first-seen week plus a 64-bit mask of offsets
  * already emitted — O(1) bytes per user, the novel-key-detection state
  * shape (contrast with the running-sum twins: here state answers "have
  * I seen this (user, week) before", not "what is the total"). Offsets
  * ≥ [[MaxOffsetWeeks]] are ignored (a production retention window;
  * dialing it up swaps the mask for a set).
  *
  * Ordering contract: a user's cohort is their FIRST event's week, so
  * the twin equals the batch min-week semantics when each user's events
  * arrive in event-time order — the per-partition ordering Kafka
  * provides for key-partitioned streams (SURVEY T6). Late events from
  * BEFORE the recorded cohort would need a retraction pass; that is a
  * watermark policy, not state this operator can repair silently.
  */
object StreamCohort {

  val MaxOffsetWeeks = 64

  final case class UserEvent(user_id: Long, ts: Timestamp)
  final case class Increment(cohort_week: String, week_offset: Long, user_id: Long)
  final case class CohortState(firstWeekDay: Long, seenMask: Long)

  /** Monday-start week truncation, matching both engines'
    * `date_trunc('week', ts)` — returned as the epoch DAY of that
    * Monday (integer arithmetic only). */
  private[streaming] def weekStartDay(ts: Timestamp): Long =
    LocalDate.ofInstant(ts.toInstant, ZoneOffset.UTC)
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      .toEpochDay

  private def flat(userId: Long, events: Iterator[UserEvent],
                   state: GroupState[CohortState]): Iterator[Increment] = {
    var st = state.getOption.getOrElse(CohortState(Long.MinValue, 0L))
    val out = Seq.newBuilder[Increment]
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val wk = weekStartDay(e.ts)
      if (st.firstWeekDay == Long.MinValue) st = CohortState(wk, 0L)
      val off = (wk - st.firstWeekDay) / 7
      if (off >= MaxOffsetWeeks) {
        // Surface the window bound instead of silently diverging from
        // the uncapped batch triangle (round-6 ADVICE): beyond-window
        // retention is a deliberate production cap, but it must be
        // visible when it fires.
        System.err.println(
          s"[stream-cohort] dropping increment: user $userId offset $off " +
            s">= MaxOffsetWeeks=$MaxOffsetWeeks (batch twin has no cap)")
      }
      if (off >= 0 && off < MaxOffsetWeeks && (st.seenMask & (1L << off)) == 0L) {
        out += Increment(
          LocalDate.ofEpochDay(st.firstWeekDay).toString, off, userId)
        st = st.copy(seenMask = st.seenMask | (1L << off))
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** First-activity increments over a (user_id, ts) stream. */
  def incrementsOverStream(events: Dataset[UserEvent]): Dataset[Increment] = {
    implicit val incEnc = Encoders.product[Increment]
    implicit val stEnc = Encoders.product[CohortState]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(flat)
  }

  def outputMode: OutputMode = OutputMode.Append()
}
