package graft.streaming

import graft.text.TextQueries
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.TextQueries.dsirWeights]] — the
  * deployment shape of DSIR data selection: the hashed-unigram raw and
  * target models are trained ONCE on a reference corpus (batch), frozen
  * into a per-bucket weight table, and every arriving document is
  * scored against it. Like [[StreamLmScore]], scoring is a pure per-row
  * projection (bucket weights via a literal map inlined into the plan),
  * so the stream is STATELESS — append mode, no watermark, no
  * aggregation state — and a micro-batch of one document scores
  * identically to a batch of a million, the parity StreamDsirSpec pins
  * against the batch query.
  *
  * The acceptance threshold is frozen with the model: the batch query
  * accepts documents above the corpus-mean weight (logw·N > Σlogw), so
  * the stream carries the reference corpus's (Σlogw, N) and applies the
  * same integer-exact comparison. A token hashing to a bucket the
  * reference corpus never populated scores `oovWeight` — the count-1 /
  * count-1 convention (bitLen(N_raw) − bitLen(N_target)), which cannot
  * occur in the parity spec (the stream replays the training corpus)
  * but keeps deployment total.
  */
object StreamDsir {

  /** Score a (doc_id, text) stream against frozen DSIR weights:
    * `weights` maps each populated bucket to its surprisal difference,
    * `oovWeight` covers never-populated buckets, and (`totalLogw`,
    * `nDocs`) freeze the reference corpus's acceptance threshold.
    * Emits (doc_id, n_toks, dsir_logw, keep) — the batch schema. */
  def scoreOverStream(docs: DataFrame, weights: Seq[(Long, Long)],
                      oovWeight: Long, totalLogw: Long,
                      nDocs: Long): DataFrame = {
    require(weights.nonEmpty, "empty weight table")
    val wmap = map(weights.flatMap { case (b, d) =>
      Seq(lit(b), lit(d)) }: _*)
    def d(tok: Column): Column =
      coalesce(
        element_at(wmap,
          pmod(TextQueries.hex32(tok), lit(TextQueries.DsirBuckets.toLong))),
        lit(oovWeight))
    docs
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        aggregate(transform(col("w"), d(_)), lit(0L), _ + _).as("dsir_logw"))
      .withColumn("keep", col("dsir_logw") * lit(nDocs) > lit(totalLogw))
  }

  def outputMode: OutputMode = OutputMode.Append()
}
