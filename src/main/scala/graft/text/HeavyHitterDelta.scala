package graft.text

import graft.Tables
import graft.text.TextQueries.words
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heavy-hitter drift between corpus halves — the token-level "what
  * changed" diagnostic a crawl-over-crawl curation run reads next to
  * the distributional drift score ([[Drift]]): split the corpus into
  * an early and a late half by the doc_id midpoint (the ingestion
  * order), count every token in each half, and surface the tokens with
  * the largest absolute count change. Where [[Drift]] answers "HOW
  * different are the distributions", this answers "WHICH tokens moved"
  * — the actionable face of the same signal.
  *
  * Everything is integer arithmetic on counts: the midpoint is
  * `(min+max) div 2` (one 2-row broadcastable scalar), the per-half
  * counts come from ONE token groupBy with conditional sums (map-side
  * partials — never a groupBy on (token, half), which would double the
  * shuffle), and the top-k is a TakeOrdered by (|delta| desc, token
  * asc) — total order, cross-engine hash-exact.
  *
  * Scale shape at 100 TB: token explode is linear in corpus tokens;
  * the single groupBy is the only shuffle and combines map-side (zipf
  * heads arrive as one partial per task); top-k never materializes a
  * global sort. */
object HeavyHitterDelta {

  val TopK = 50

  def tokenFreqDelta(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(s, dir, "documents")
    val mid = docs.agg(((min("doc_id") + max("doc_id")) / 2)
      .cast("long").as("mid"))
    val toks = docs.crossJoin(broadcast(mid))
      .select(col("doc_id"), col("mid"), explode(words(col("text"))).as("tok"))
    toks.groupBy("tok")
      .agg(sum(when(col("doc_id") <= col("mid"), 1L).otherwise(0L))
             .cast("long").as("cnt_early"),
           sum(when(col("doc_id") > col("mid"), 1L).otherwise(0L))
             .cast("long").as("cnt_late"))
      .withColumn("delta", col("cnt_late") - col("cnt_early"))
      .orderBy(abs(col("delta")).desc, col("tok").asc)
      .limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_freq_delta" -> tokenFreqDelta)

  val oracles: Map[String, String] = Map(
    "token_freq_delta" ->
      s"""WITH mid AS (
        |  SELECT ((min(doc_id) + max(doc_id)) // 2)::BIGINT AS mid
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    x -> x <> '')) AS tok
        |  FROM documents),
        |cnt AS (
        |  SELECT tok,
        |    sum(CASE WHEN doc_id <= (SELECT mid FROM mid)
        |        THEN 1 ELSE 0 END)::BIGINT AS cnt_early,
        |    sum(CASE WHEN doc_id > (SELECT mid FROM mid)
        |        THEN 1 ELSE 0 END)::BIGINT AS cnt_late
        |  FROM toks GROUP BY tok)
        |SELECT tok, cnt_early, cnt_late,
        |  (cnt_late - cnt_early)::BIGINT AS delta
        |FROM cnt
        |ORDER BY abs(cnt_late - cnt_early) DESC, tok ASC
        |LIMIT $TopK""".stripMargin)
}
