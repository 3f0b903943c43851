package graft.streaming

import graft.text.TextQueries
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.TextQueries.qualityLmScore]] — the
  * deployment shape of the perplexity filter: the unigram LM is trained
  * ONCE on a reference corpus (batch), frozen, and every arriving
  * document is scored against it. Scoring is a pure per-row projection
  * (token surprisals via higher-order functions over a literal vocab
  * map — the broadcast side inlined into the plan), so the stream is
  * STATELESS: append mode, no watermark, no aggregation state; a
  * micro-batch of one document and a batch of a million score
  * identically, which is the parity StreamLmScoreSpec pins against the
  * batch query.
  *
  * The surprisal arithmetic matches the batch/oracle formula
  * (`length(bin(N div c))`) with the integral division expressed as
  * `(N - pmod(N, c)) / c` — exact for N < 2⁵³ (a 100 TB corpus is
  * ~2×10¹³ tokens, far below), because SQL `div` has no lambda-capable
  * Column form.
  */
object StreamLmScore {

  /** Score a (doc_id, text) stream against a frozen LM: `vocab` is the
    * top-K (token, count) table, `n` the training-corpus token total.
    * Emits (doc_id, n_toks, lm_score, grade) — the batch query's schema. */
  def scoreOverStream(docs: DataFrame, vocab: Seq[(String, Long)],
                      n: Long): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    val vmap = map(vocab.flatMap { case (t, c) =>
      Seq(lit(t), lit(c)) }: _*)
    def surp(tok: Column): Column = {
      val c = coalesce(element_at(vmap, tok), lit(1L))
      length(bin(((lit(n) - pmod(lit(n), c)) / c).cast("long"))).cast("long")
    }
    docs
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        round(aggregate(transform(col("w"), surp(_)), lit(0L), _ + _)
          .cast("double") / size(col("w")), 4).as("lm_score"))
      .withColumn("grade",
        when(col("lm_score") <= 6.0, "natural")
          .when(col("lm_score") <= 12.0, "mixed")
          .otherwise("synthetic"))
  }

  def outputMode: OutputMode = OutputMode.Append()
}
