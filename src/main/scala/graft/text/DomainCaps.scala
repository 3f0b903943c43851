package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source document caps — the C4/RefinedWeb guard that stops one
  * crawl domain from dominating a mixed pretraining corpus: keep at most
  * [[CapN]] documents per source, preferring the highest quality score,
  * deterministic doc_id tie-break.
  *
  * The scale-correct part is selecting the top-N WITHOUT the naive
  * `row_number() OVER (PARTITION BY source ORDER BY score DESC)` — that
  * window sorts every document of a hot domain inside one task (at
  * 100 TB a single crawl domain can be terabytes). Instead this is a
  * THRESHOLD-SELECT over the bounded score domain (the e4 lexical score
  * of [[QuantileNorm.scored]], ≤ 10,001 values):
  *
  *   1. (source, score) histogram — shuffle ∝ sources × score domain,
  *      map-side combined;
  *   2. one window over that tiny relation finds, per source, the
  *      threshold bucket t (lowest score with strictly-greater
  *      cumulative count < N) and the open slot count r = N − greater;
  *   3. docs with score > t broadcast-join through — kept with NO sort
  *      anywhere (`above_cap_threshold`);
  *   4. ONLY the tie slice (docs at exactly score t in that source) pays
  *      a row_number, and the window partition is the slice, not the
  *      domain — its smallest-doc_id r rows fill the cap (`tie_break`).
  *
  * The output set is provably the global top-N by (score desc, doc_id):
  * every doc above t beats every doc at t, and within t the doc_id order
  * is replayed exactly — which is what the oracle checks with the naive
  * full-sort SQL. Worst case (an entire domain sharing ONE score) makes
  * the tie slice the whole domain; the slice window is still narrower
  * than the naive formulation's (domain-wide, every domain). */
object DomainCaps {

  /** Cap per source. Binds at every fixture SF (25–250 docs/source). */
  val CapN = 15

  def domainCaps(s: SparkSession, dir: String): DataFrame = {
    val docs = QuantileNorm.scored(s, dir)
    val hist = docs.groupBy(col("source"), col("score_e4"))
      .agg(count(lit(1)).as("cnt"))
    val wDesc = Window.partitionBy("source").orderBy(col("score_e4").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("greater",
      coalesce(sum("cnt").over(wDesc), lit(0L)))
    // threshold bucket: lowest score among those with greater < N
    val thr = cum.filter(col("greater") < CapN)
      .groupBy(col("source").as("t_source"))
      .agg(min_by(struct(col("score_e4"), col("greater")),
        col("score_e4")).as("tb"))
      .select(col("t_source"), col("tb.score_e4").as("t_score"),
        (lit(CapN.toLong) - col("tb.greater")).as("slots"))
    val joined = docs.join(broadcast(thr), col("source") === col("t_source"))
    val above = joined.filter(col("score_e4") > col("t_score"))
      .select(col("doc_id"), col("source"), col("score_e4"),
        lit("above_cap_threshold").as("keep_via"))
    val slice = joined.filter(col("score_e4") === col("t_score"))
    val wTie = Window.partitionBy("source").orderBy("doc_id")
    val tie = slice.withColumn("rk", row_number().over(wTie))
      .filter(col("rk") <= col("slots"))
      .select(col("doc_id"), col("source"), col("score_e4"),
        lit("tie_break").as("keep_via"))
    above.unionByName(tie)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "domain_caps" -> domainCaps)

  val oracles: Map[String, String] = Map(
    "domain_caps" ->
      s"""WITH sc AS (
        |  SELECT doc_id, source,
        |    round(len(list_distinct(list_filter(string_split(text, ' '),
        |            x -> x <> '')))::DOUBLE
        |        / len(list_filter(string_split(text, ' '),
        |            x -> x <> ''))::DOUBLE * 10000)::BIGINT AS score_e4
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
        |rk AS (
        |  SELECT doc_id, source, score_e4,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score_e4 DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM sc),
        |t AS (
        |  SELECT source,
        |    CASE WHEN max(n) >= $CapN
        |         THEN max(CASE WHEN rk = $CapN THEN score_e4 END)
        |         ELSE min(score_e4) END AS t_score
        |  FROM rk GROUP BY source)
        |SELECT r.doc_id, r.source, r.score_e4,
        |  CASE WHEN r.score_e4 > t.t_score THEN 'above_cap_threshold'
        |       ELSE 'tie_break' END AS keep_via
        |FROM rk r JOIN t USING (source)
        |WHERE r.rk <= $CapN""".stripMargin)
}
