package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction — the top-k most
  * characteristic terms of each document (Spärck Jones 1972), the
  * indexing/tagging readout a corpus pipeline publishes beside BM25
  * retrieval (same df statistics, document-side instead of query-side).
  *
  * Deliberately INTEGER-EXACT across engines (the `quality_lm_score`
  * discipline): idf is the bit-length `length(bin(N div df))` =
  * floor(log2(N/df)) + 1 — no `ln((N+1)/(df+1))` double whose last-ulp
  * rounding could differ between Spark and DuckDB — and the weight is
  * the exact integer `tf · idf_bits`. Ranking ties break on the term
  * string, so the top-k set is fully deterministic.
  *
  * Scale shape: tf is one (doc_id, term) hash aggregation over the
  * exploded token stream (map-side combined, ∝ distinct doc-term
  * pairs); df is a term-keyed aggregation OVER THE TF RELATION (never a
  * second corpus scan, and `countDistinct(doc_id)` is free — tf rows
  * are already distinct per (doc, term)); the df table joins back
  * BROADCAST-hinted (vocabulary-bounded, the `quality_lm_score`
  * adjudication: a production 10⁵–10⁶ vocab still broadcasts in MBs).
  * The only window partitions by doc_id — bounded by the terms of ONE
  * document — and Catalyst compiles the rank filter to
  * WindowGroupLimit, so each partition keeps k rows, never sorts the
  * corpus. */
object Keywords {

  /** Keywords per document. */
  val TopK = 5

  def keywordTfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(TextQueries.words(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val n1 = tf.agg(countDistinct("doc_id").as("n"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n1))
      .select(col("term").as("d_term"),
        length(bin(expr("n div df"))).cast("long").as("idf_bits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("weight").desc, col("term").asc)
    tf.join(broadcast(df), col("term") === col("d_term"))
      .select(col("doc_id"), col("term"), col("tf"), col("idf_bits"),
        (col("tf") * col("idf_bits")).as("weight"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK) // int rank here: WindowGroupLimit fires
      .withColumn("rank", col("rank").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "keyword_tfidf_topk" -> keywordTfidfTopk)

  val oracles: Map[String, String] = Map(
    "keyword_tfidf_topk" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  GROUP BY doc_id, term),
        |n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM tf),
        |df AS (
        |  SELECT term, length(bin((SELECT n FROM n) // count(*)))::BIGINT
        |    AS idf_bits
        |  FROM tf GROUP BY term),
        |ranked AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.idf_bits,
        |    (tf.tf * df.idf_bits)::BIGINT AS weight,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * df.idf_bits DESC, tf.term) AS rank
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, idf_bits, weight, rank::BIGINT AS rank
        |FROM ranked WHERE rank <= $TopK""".stripMargin)
}
