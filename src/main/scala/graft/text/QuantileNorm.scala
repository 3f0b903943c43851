package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source quantile normalization of a document quality score — the
  * cross-source calibration step a mixed-corpus pipeline runs before
  * applying one global keep threshold (CCNet buckets its perplexity
  * scores per language/shard for exactly this reason: a raw score of X
  * means different things in different sources, a within-source
  * percentile is comparable everywhere).
  *
  * The score is the lexical-diversity ratio quantized to an e4 integer
  * (`round(n_uniq / n_words * 1e4)` — the `text_quality` readout, so the
  * calibrated face composes with an already-proven component), which
  * BOUNDS the score domain at 10,001 values. That bound is what makes
  * the op scale-correct: the naive `percent_rank() OVER (PARTITION BY
  * source ORDER BY score)` sorts every document of a source inside one
  * partition (the RFM ntile trap — a hot source at 100 TB is a
  * single-task sort). Instead we reduce each source to a (source,
  * score) HISTOGRAM (shuffle ∝ sources × 10,001 at most, map-side
  * combined), take cumulative strictly-less counts with one window over
  * that tiny relation, and broadcast the per-source CDF back onto the
  * scan. The percentile is the exact integer
  * `(1e6 · cnt_less) div (n − 1)` — min-rank normalization, ties share
  * a value, order-independent, cross-engine exact (no percent_rank
  * double division).
  *
  * The streaming face ([[graft.streaming.StreamQuantileNorm]]) freezes
  * the per-source CDF as a sources-bounded broadcast and scores arriving
  * documents statelessly — the deployment shape of a calibrated filter
  * on an unbounded crawl. */
object QuantileNorm {

  /** e6 percentile band edges for the calibrated keep decision. */
  val KeepE6 = 750000L
  val MidE6  = 250000L

  /** (doc_id, source, score_e4) — the raw per-doc score relation. */
  def scored(s: SparkSession, dir: String): DataFrame = {
    val w = TextQueries.words(col("text"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(w).as("n_words"), size(array_distinct(w)).as("n_uniq"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("source"),
        round(col("n_uniq").cast("double") / col("n_words").cast("double")
          * 10000, 0).cast("long").as("score_e4"))
  }

  /** Per-source CDF over the bounded score domain:
    * (source, score_e4, cnt_less, n). */
  def cdf(docs: DataFrame): DataFrame = {
    val h = docs.groupBy(col("source"), col("score_e4"))
      .agg(count(lit(1)).as("cnt"))
    val wLess = Window.partitionBy("source").orderBy("score_e4")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("source")
    h.withColumn("cnt_less", coalesce(sum("cnt").over(wLess), lit(0L)))
      .withColumn("n", sum("cnt").over(wAll))
      .select(col("source"), col("score_e4"), col("cnt_less"), col("n"))
  }

  /** Exact integer min-rank percentile in e6: (1e6·cnt_less) div (n−1),
    * 0 for a single-doc source. */
  def pctE6(cntLess: Column, n: Column): Column =
    when(n > 1, expr("(1000000 * cnt_less) div (n - 1)"))
      .otherwise(lit(0L)).cast("long")

  def band(pct: Column): Column =
    when(pct >= KeepE6, "keep_top")
      .when(pct >= MidE6, "mid")
      .otherwise("tail")

  def qualityQuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val docs = scored(s, dir)
    val c = cdf(docs).withColumnRenamed("source", "c_source")
      .withColumnRenamed("score_e4", "c_score")
    docs.join(broadcast(c),
        col("source") === col("c_source") && col("score_e4") === col("c_score"))
      .select(col("doc_id"), col("source"), col("score_e4"),
        pctE6(col("cnt_less"), col("n")).as("pct_e6"))
      .withColumn("calib_band", band(col("pct_e6")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_quantile_norm" -> qualityQuantileNorm)

  /** SQL twin of [[scored]] (CTE `sc(doc_id, source, score_e4)`) —
    * shared with the source-KS oracle so both gates bind one score
    * definition. */
  val scoredCteSql: String =
    """sc AS (
      |  SELECT doc_id, source,
      |    round(len(list_distinct(list_filter(string_split(text, ' '),
      |            x -> x <> '')))::DOUBLE
      |        / len(list_filter(string_split(text, ' '),
      |            x -> x <> ''))::DOUBLE * 10000)::BIGINT AS score_e4
      |  FROM documents
      |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "quality_quantile_norm" ->
      (s"WITH $scoredCteSql,\n" +
        s"""h AS (
        |  SELECT source, score_e4, count(*)::BIGINT AS cnt FROM sc
        |  GROUP BY source, score_e4),
        |c AS (
        |  SELECT source, score_e4,
        |    coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY score_e4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS cnt_less,
        |    sum(cnt) OVER (PARTITION BY source)::BIGINT AS n
        |  FROM h),
        |p AS (
        |  SELECT sc.doc_id, sc.source, sc.score_e4,
        |    CASE WHEN c.n > 1
        |         THEN (1000000 * c.cnt_less) // (c.n - 1)
        |         ELSE 0 END::BIGINT AS pct_e6
        |  FROM sc JOIN c
        |    ON sc.source = c.source AND sc.score_e4 = c.score_e4)
        |SELECT doc_id, source, score_e4, pct_e6,
        |  CASE WHEN pct_e6 >= $KeepE6 THEN 'keep_top'
        |       WHEN pct_e6 >= $MidE6 THEN 'mid'
        |       ELSE 'tail' END AS calib_band
        |FROM p""".stripMargin))
}
