package graft.streaming

import graft.operators.EwmaAnomaly
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming twin of [[graft.operators.EwmaAnomaly.ewmaAnomaly]] — the
  * true deployment shape of an online anomaly monitor: per arriving
  * event, score against the user's last-[[EwmaAnomaly.W]] ring buffer
  * and update it. State per user is exactly W integer cents (plus the
  * (ts, event_id) order key of the last event) — O(W) bytes, the
  * minimal truncated-EWMA state; no history rescan ever.
  *
  * The batch query's window orders by the total (ts, event_id) key; the
  * twin equals it when each user's events arrive in that order (the
  * per-partition ordering Kafka provides for key-partitioned streams,
  * SURVEY T6), and within a micro-batch it re-sorts by the same key so
  * batching boundaries never reorder a chain —
  * the [[StreamTransitions]] discipline. */
object StreamEwma {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
                      value: Double)
  final case class Flag(event_id: Long, user_id: Long, vc: Long,
                        num: Long, den: Long, is_anomaly: Boolean)
  /** recent(0) = most recent prior value, ≤ W entries. */
  final case class Hist(recent: Seq[Long])

  private def score(userId: Long, events: Iterator[Ev],
                    state: GroupState[Hist]): Iterator[Flag] = {
    var recent = state.getOption.map(_.recent).getOrElse(Seq.empty)
    val out = Seq.newBuilder[Flag]
    events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val vc = math.round(e.value * 100)
      val num = recent.iterator.zipWithIndex
        .map { case (v, j) => v * EwmaAnomaly.weight(j + 1) }.sum
      val den = recent.indices.map(j => EwmaAnomaly.weight(j + 1)).sum
      val anom = recent.length >= EwmaAnomaly.MinHist &&
        math.abs(vc * den - num) > EwmaAnomaly.ThresholdCents * den
      out += Flag(e.event_id, userId, vc, num, den, anom)
      recent = (vc +: recent).take(EwmaAnomaly.W)
    }
    state.update(Hist(recent))
    out.result().iterator
  }

  /** Anomaly flags over a keyed event stream — emits the batch gate's
    * exact schema. */
  def flagsOverStream(events: Dataset[Ev]): Dataset[Flag] = {
    implicit val flagEnc = Encoders.product[Flag]
    implicit val histEnc = Encoders.product[Hist]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(score)
  }

  def outputMode: OutputMode = OutputMode.Append()
}
