package graft.text

import graft.Tables
import graft.text.TextQueries.words
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus drift detection — the monitoring pass a production pipeline
  * runs between two crawl/snapshot generations to catch distribution
  * shift before it reaches training: per source, the tokens whose usage
  * rate moved most between snapshots.
  *
  * The two "snapshots" are the deterministic halves `doc_id % 2` (the
  * same stand-in discipline the decontamination operators use for the
  * eval set); swapping in a real `snapshot` column is a one-line input
  * change. The drift statistic is the cross-multiplied rate difference
  * |n₀·N₁ − n₁·N₀| — the numerator of |n₀/N₀ − n₁/N₁| over the common
  * denominator — so the ranking is INTEGER-exact cross-engine (no
  * division, no epsilon). At gate scale the products stay far below
  * 2⁶³; a 100 TB run lifts the same expression to decimal(38,0) or
  * divides by a per-million scale first.
  *
  * Scale shape: one token explode → one (source, token, half) count with
  * map-side partials, a broadcast join of the per-source totals (one row
  * per source × 2), and a top-k window over the per-(source, token)
  * rollup — never over raw tokens.
  */
object Drift {

  val TopK = 5

  def sourceDrift(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.parallel(s, dir, "documents")
      .select(col("source"), (col("doc_id") % 2).as("h"),
        explode(words(col("text"))).as("t"))
    val cnt = tok.groupBy("source", "t")
      .agg(sum(when(col("h") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("n1"))
    val totals = cnt.groupBy("source")
      .agg(sum("n0").as("total0"), sum("n1").as("total1"))
    val w = Window.partitionBy("source").orderBy(desc("drift"), asc("t"))
    cnt.join(broadcast(totals), "source")
      .withColumn("drift",
        abs(col("n0") * col("total1") - col("n1") * col("total0")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("t").as("token"), col("n0"), col("n1"), col("drift"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_drift" -> sourceDrift)

  val oracles: Map[String, String] = Map(
    "source_drift" ->
      s"""WITH tok AS (SELECT source, doc_id % 2 AS h,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |           AS t
        |       FROM documents),
        |cnt AS (SELECT source, t,
        |          sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |          sum(CASE WHEN h = 1 THEN 1 ELSE 0 END)::BIGINT AS n1
        |        FROM tok GROUP BY source, t),
        |tot AS (SELECT source, sum(n0)::BIGINT AS total0,
        |          sum(n1)::BIGINT AS total1
        |        FROM cnt GROUP BY source),
        |sc AS (SELECT cnt.source, cnt.t, cnt.n0, cnt.n1,
        |         abs(cnt.n0 * tot.total1 - cnt.n1 * tot.total0) AS drift
        |       FROM cnt JOIN tot USING (source))
        |SELECT source, rk, t AS token, n0, n1, drift FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY source ORDER BY drift DESC, t ASC) AS rk
        |  FROM sc)
        |WHERE rk <= $TopK""".stripMargin)
}
