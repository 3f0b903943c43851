package graft.streaming

import graft.text.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.Sampling.splitLeakage]] — ONLINE
  * decontamination monitoring, the deployment shape of the leakage
  * report: as candidate training documents arrive, each is checked
  * against the frozen corpus near-dup index
  * ([[StreamNearDup.matchesOverStream]]) and flagged when its matched
  * corpus partner sits in the val/test split — eval material entering
  * the training stream is caught at ingest, not at the next batch
  * audit. Stateless stream-static joins against the frozen index + the
  * frozen split assignment (a broadcastable doc_id → split projection):
  * micro-batching cannot change any flag, and the batch report is the
  * same relation computed corpus-at-rest. */
object StreamSplitLeakage {

  /** Frozen split assignment of the indexed corpus. */
  def splitTable(s: SparkSession, dir: String): DataFrame =
    Sampling.trainSplit(s, dir)
      .select(col("doc_id").as("c_doc"), col("split").as("corpus_split"))

  /** Flag arriving docs whose near-dup corpus partner is NOT in train:
    * (s_doc, c_doc, corpus_split, jaccard). `docs` is a (doc_id, text)
    * stream; the index and splits are frozen batch relations. */
  def leakageOverStream(docs: DataFrame, idx: StreamNearDup.Index,
                        splits: DataFrame): DataFrame =
    StreamNearDup.matchesOverStream(docs, idx)
      // matches are (a_id, b_id) with the corpus doc on either side of
      // the least/greatest normalization; recover the corpus side by
      // joining the split table on both and keeping the hit
      .join(splits.withColumnRenamed("c_doc", "a_id")
        .withColumnRenamed("corpus_split", "split_a"), Seq("a_id"), "left")
      .join(splits.withColumnRenamed("c_doc", "b_id")
        .withColumnRenamed("corpus_split", "split_b"), Seq("b_id"), "left")
      .select(col("a_id"), col("b_id"),
        coalesce(col("split_a"), col("split_b")).as("corpus_split"),
        col("jaccard"))
      .filter(col("corpus_split") =!= "train")

  def outputMode: OutputMode = OutputMode.Append()
}
