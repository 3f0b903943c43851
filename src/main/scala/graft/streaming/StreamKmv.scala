package graft.streaming

import graft.functions.Kmv
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count — the cardinality sketch
  * ([[graft.functions.Kmv]]) as `mapGroupsWithState` state, giving a
  * running distinct estimate per key over an unbounded stream with O(k)
  * state per key (where exact streaming `countDistinct` would have to hold
  * every value seen forever). Because KMV merge is associative and
  * insensitive to arrival order, the streaming sketch after any prefix of
  * micro-batches equals the batch sketch over the same rows — the parity
  * the spec pins. Update mode; no watermark needed (the sketch never
  * evicts — it only shrinks toward smaller hashes).
  */
object StreamKmv {

  final case class HashEvent(key: String, h: Long)

  final case class KmvUpdate(key: String, n_kept: Int, est_distinct: Double)

  /** Fold a micro-batch of hashes into the per-key sketch. */
  def updateState(
      key: String,
      events: Iterator[HashEvent],
      state: GroupState[Kmv.Buf]): KmvUpdate = {
    val agg = new Kmv.KmvAgg(Kmv.K)
    var buf = state.getOption.getOrElse(agg.zero)
    for (e <- events) buf = agg.reduce(buf, e.h)
    state.update(buf)
    KmvUpdate(key, buf.items.size, estimate(buf))
  }

  /** The same estimator the batch gate query computes — delegated to the
    * single shared definition so the two surfaces cannot drift. */
  def estimate(buf: Kmv.Buf): Double = Kmv.estimate(buf)

  /** Streaming query: running per-key distinct estimates, update mode. */
  def distinctOverStream(events: Dataset[HashEvent])(
      implicit spark: SparkSession): Dataset[KmvUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (k: String, it: Iterator[HashEvent], st: GroupState[Kmv.Buf]) =>
          updateState(k, it, st))
  }

  def outputMode: OutputMode = OutputMode.Update()
}
