package graft.streaming

import graft.text.{TextQueries, WordPiece}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of the tokenizer APPLY side — the ingest-time
  * accounting a serving pipeline runs: pieces are trained ONCE
  * ([[WordPiece.trainPieces]], batch), frozen, and every arriving
  * document reports its token count under that vocabulary (billing,
  * packing budgets, sequence-length routing). The maximal-munch fold
  * runs per WORD inside a `transform` lambda and sums per document —
  * nested higher-order functions, still one pure per-row projection:
  * STATELESS append mode, no watermark, no aggregation state, so
  * micro-batching cannot change any count and stream ≡ batch is exact
  * integer equality ([[graft.text.WordPiece.munchSql]] is the single
  * fold definition both sides compile from).
  *
  * The batch gate tokenizes the DISTINCT-word relation and multiplies
  * by occurrence counts; this twin pays the fold per occurrence instead
  * — the right trade on an unbounded stream, where there is no final
  * vocabulary relation to aggregate. */
object StreamTokenize {

  /** Per-document token accounting of a (doc_id, source, text) stream
    * against frozen pieces: (doc_id, source, n_words, chars, n_tokens). */
  def countsOverStream(docs: DataFrame, pieces: Seq[String]): DataFrame = {
    val perWordMunch = WordPiece.munchSql(pieces, "x")
    docs
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) > 0)
      .select(
        col("doc_id"), col("source"),
        size(col("w")).cast("long").as("n_words"),
        expr("aggregate(transform(w, x -> char_length(x)), 0, (a, b) -> a + b)")
          .cast("long").as("chars"),
        expr(s"aggregate(transform(w, x -> $perWordMunch), 0, (a, b) -> a + b)")
          .cast("long").as("n_tokens"))
  }

  def outputMode: OutputMode = OutputMode.Append()
}
