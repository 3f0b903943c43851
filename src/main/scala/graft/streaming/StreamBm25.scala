package graft.streaming

import graft.text.{Retrieval, TextQueries}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.Retrieval]] — the deployment shape of
  * retrieval scoring in an ingest pipeline: corpus statistics (per-term
  * df, N, Σdl) are trained ONCE on the reference corpus
  * ([[Retrieval.trainStats]]), frozen, and every arriving document is
  * scored against them. tf and dl come from the arriving document
  * itself, so scoring is a pure per-row projection over literal stats —
  * STATELESS append mode, no watermark, no aggregation; a micro-batch
  * of one document scores identically to a batch of a million, which is
  * the parity `StreamBm25Spec` pins row-for-row against the batch
  * scorer on the same frozen corpus.
  *
  * The expression tree mirrors [[Retrieval.bm25]] operation-for-
  * operation (idf = (N−df+0.5)/(df+0.5) etc. built from the same
  * literals), so the doubles are bit-identical, not merely close.
  * Unlike the batch gate there is no top-k — ranking an unbounded
  * stream is a sink-side concern; the scorer emits every document with
  * at least one query-term hit, the same retrieved-set semantics as the
  * batch tf relation.
  */
object StreamBm25 {

  /** Score a (doc_id, text) stream against frozen stats. Emits the batch
    * pivot's schema: (doc_id, dl, s_&lt;term&gt;…, score). */
  def scoreOverStream(docs: DataFrame, stats: Retrieval.CorpusStats): DataFrame = {
    require(stats.nDocs > 0, "empty training corpus")
    def termScore(t: String): Column = {
      val tf = size(filter(col("w"), x => x === t)).cast("long")
      stats.df.get(t) match {
        case None => lit(0.0) // term absent from the training corpus
        case Some(dfT) =>
          when(tf > 0,
            Retrieval.scoreExpr(tf, lit(dfT), col("dl"),
              lit(stats.nDocs), lit(stats.sumDl)))
            .otherwise(lit(0.0))
      }
    }
    val scored = docs
      .withColumn("w", TextQueries.words(col("text")))
      .withColumn("dl", size(col("w")))
      .select(Seq(col("doc_id"), col("dl").cast("long").as("dl")) ++
        Retrieval.QueryTerms.map(t => termScore(t).as(s"s_$t")): _*)
    val total = Retrieval.QueryTerms.map(t => col(s"s_$t")).reduceLeft(_ + _)
    scored
      .filter(total > 0.0)
      .select(Seq(col("doc_id"), col("dl")) ++
        Retrieval.QueryTerms.map(t => round(col(s"s_$t"), 4).as(s"s_$t")) :+
        round(total, 4).as("score"): _*)
  }

  def outputMode: OutputMode = OutputMode.Append()
}
