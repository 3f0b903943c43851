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

  /** Cross-split LEAK-DOC flags for the online release composition —
    * the batch blocker ([[Sampling.splitLeakage]]: verified near-dup
    * pairs whose members landed in DIFFERENT splits) maintained at
    * ingest. Each arriving doc probes the frozen near-dup index; both
    * sides' splits come from the SAME hash assignment
    * ([[Sampling.splitOf]] — a pure in-row expression, no table), and a
    * differing pair flags BOTH endpoints, because the batch gate counts
    * every document touching a leaking pair. Sources: the arriving
    * doc's rides the batch; the frozen partner's comes from
    * `corpusSources` (`c_doc`, `c_source` — the doc→source projection
    * frozen with the index).
    *
    * Output: DISTINCT (doc_id, source). Distinct-SET semantics are
    * load-bearing downstream: a pair is rediscovered from its second
    * endpoint when that endpoint arrives, so a counting monoid would
    * double-flag — the versioned store unions and dedups instead
    * ([[StreamRelease]]), and its size is ∝ flagged docs (alert-sized),
    * never corpus-sized. */
  def crossSplitFlags(batch: DataFrame, idx: StreamNearDup.Index,
                      corpusSources: DataFrame): DataFrame = {
    val hits = StreamNearDup.rawMatches(
        batch.select(col("doc_id"), col("text")), idx)
      .filter(Sampling.splitOf(col("s_doc")) =!= Sampling.splitOf(col("c_doc")))
    val sSide = hits.select(col("s_doc").as("doc_id"))
      .join(batch.select(col("doc_id"), col("source")), "doc_id")
    val cSide = hits.select(col("c_doc").as("doc_id"))
      .join(corpusSources.select(col("c_doc").as("doc_id"),
        col("c_source").as("source")), "doc_id")
    sSide.unionByName(cSide).distinct()
  }
}
