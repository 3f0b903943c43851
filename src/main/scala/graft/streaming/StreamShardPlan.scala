package graft.streaming

import graft.sources.ShardPlan
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[ShardPlan.placed]] — the ONLINE writer: as
  * survivor documents append to a source's corpus, each is placed at
  * its byte offset and shard the moment it arrives, with state per
  * source of exactly ONE long (the running byte total). The batch gate
  * recomputes placement from scratch with the two-level prefix sum;
  * this twin is the O(1)-per-doc incremental form of the same
  * recurrence — `StreamShardPlanSpec` proves the streamed placements
  * equal the batch relation row-for-row over the full survivor corpus.
  *
  * Ordering: within a micro-batch a source's docs re-sort by `doc_id`
  * (the [[StreamEwma]] discipline); across batches the twin assumes
  * per-source `doc_id`-ordered arrival — the corpus append order
  * ([[graft.sources.CorpusManifest]] writes sources sorted by doc_id,
  * and a Kafka source keyed by `source` preserves it, SURVEY T6).
  * Out-of-order backfill is the batch gate's job: replan from scratch.
  *
  * Scale: state ∝ sources (one long each), emit ∝ arriving docs —
  * the online path never touches the standing corpus, exactly like
  * `manifest_delta`'s monoid merge. */
object StreamShardPlan {

  final case class DocIn(source: String, doc_id: Long, bytes: Long)
  final case class Placement(source: String, doc_id: Long,
                             start: Long, shard_ix: Long)

  private def step(source: String, docs: Iterator[DocIn],
                   state: GroupState[Long]): Iterator[Placement] = {
    var acc = state.getOption.getOrElse(0L)
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      val start = acc
      acc += d.bytes
      Placement(source, d.doc_id, start, start / ShardPlan.TargetShardBytes)
    }
    state.update(acc)
    out.iterator
  }

  /** Per-doc shard placement over a keyed append stream. */
  def placedOverStream(docs: Dataset[DocIn]): Dataset[Placement] = {
    implicit val pEnc = Encoders.product[Placement]
    implicit val lEnc = Encoders.scalaLong
    implicit val sEnc = Encoders.STRING
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step _)
  }

  def outputMode: OutputMode = OutputMode.Append()
}
