package graft.streaming

import graft.dedup.DedupQueries
import graft.text.TextQueries.{trigrams, words}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.NgramNovelty]] — the ingest-time face
  * of novelty accounting: as candidate documents arrive, each distinct
  * trigram is checked against the FROZEN corpus trigram index and only
  * the genuinely new ones are emitted (`(doc_id, s)` novel-gram
  * instances, the relation a crawl-intake dashboard sums into "how much
  * new text is this snapshot actually bringing"). Stateless stream-
  * static LEFT ANTI join — no state store, no watermark, micro-batching
  * cannot change any row, so the stream output is set-equal to the
  * batch recompute of the same arrivals against the same frozen index
  * (two arriving docs introducing the same new gram BOTH emit it, in
  * the stream and in the batch recompute alike; first-wins attribution
  * is the at-rest operator's job, where min(doc_id) is well-defined). */
object StreamNovelty {

  /** Frozen distinct-trigram index of the at-rest corpus — the static
    * side of the anti join (shuffle-partitioned, never collected). */
  def frozenGrams(s: SparkSession, dir: String): DataFrame =
    DedupQueries.shingles(s, dir).select("s").distinct()

  /** Novel (doc_id, s) instances of a (doc_id, text) document stream
    * against the frozen index. */
  def novelOverStream(docs: DataFrame, frozen: DataFrame): DataFrame =
    docs.withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(trigrams(col("w"))))
        .as("s"))
      .join(frozen, Seq("s"), "left_anti")

  def outputMode: OutputMode = OutputMode.Append()
}
