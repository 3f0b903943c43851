package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming twin of [[graft.operators.EventPaths.eventTransitions]] —
  * the deployment shape of the clickstream transition matrix: as events
  * arrive, emit one (from_type → to_type) STEP per consecutive pair in
  * each user's chain. Counting steps per cell reproduces the batch
  * matrix without re-scanning history.
  *
  * State per user is exactly one record — the last event seen
  * ((ts, event_id, type), O(1) bytes) — the minimal `lead` state. The
  * batch query's window orders by the total (ts, event_id) key; the
  * twin equals it when each user's events arrive in that order (the
  * per-partition ordering Kafka provides for key-partitioned streams,
  * SURVEY T6), and within a micro-batch it re-sorts by the same key so
  * batching boundaries never reorder a chain. */
object StreamTransitions {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
                      event_type: String)
  final case class Step(from_type: String, to_type: String)
  final case class LastEvent(tsMillis: Long, eventId: Long, eventType: String)

  private def flat(userId: Long, events: Iterator[Ev],
                   state: GroupState[LastEvent]): Iterator[Step] = {
    var st = state.getOption.orNull
    val out = Seq.newBuilder[Step]
    events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      if (st != null) out += Step(st.eventType, e.event_type)
      st = LastEvent(e.ts.getTime, e.event_id, e.event_type)
    }
    if (st != null) state.update(st)
    out.result().iterator
  }

  /** Transition steps over a keyed event stream. */
  def stepsOverStream(events: Dataset[Ev]): Dataset[Step] = {
    implicit val stepEnc = Encoders.product[Step]
    implicit val stEnc = Encoders.product[LastEvent]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(flat)
  }

  def outputMode: OutputMode = OutputMode.Append()
}
