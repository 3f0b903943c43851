package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection — the quality sweep that survives
  * the outliers it hunts, unlike mean/stddev z-scores: per event type,
  * the median, the median absolute deviation, and how many values sit
  * beyond 3·MAD.
  *
  * Medians are holistic, so this is inherently TWO aggregation passes
  * (median, then median of deviations from it) plus a counting pass —
  * each one `groupBy(event_type)` over the scan with the tiny per-type
  * medians broadcast back, never a sort of the whole table. Exact
  * interpolated `percentile` ↔ DuckDB `quantile_cont` parity is already
  * pinned by q15; deviations and the 3·MAD comparison are pure IEEE
  * arithmetic on identical doubles, so the outlier COUNTS are exact
  * cross-engine too. */
object RobustStats {

  val MadK = 3.0

  def outlierMad(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").select(col("event_type"), col("value"))
    val med = e.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(max("med").as("med"), // constant within the group
        expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad.select(col("event_type"), col("mad"))), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max("med"), 4).as("med"),
        round(max("mad"), 4).as("mad"),
        sum(when(col("adev") > lit(MadK) * col("mad"), 1L).otherwise(0L))
          .cast("long").as("n_outliers"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "outlier_mad" -> outlierMad)

  val oracles: Map[String, String] = Map(
    "outlier_mad" ->
      s"""WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |d AS (SELECT e.event_type, e.value, m.med,
        |        abs(e.value - m.med) AS adev
        |      FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, max(med) AS med,
        |         quantile_cont(adev, 0.5) AS mad
        |       FROM d GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  round(max(md.med), 4) AS med, round(max(md.mad), 4) AS mad,
        |  sum(CASE WHEN d.adev > $MadK * md.mad THEN 1 ELSE 0 END)::BIGINT
        |    AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type""".stripMargin)
}
