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
      // read twice (MAD percentile + the outlier rollup) — one events pass
      .localCheckpoint(true)
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

  /** Winsorization percentile (clamp below p and above 1−p). */
  val WinsorP = 0.1

  /** Percentile-winsorized and trimmed means per event type — the
    * outlier-robust aggregates a metrics pipeline publishes next to the
    * raw mean (one fat-finger value should not move the dashboard).
    * Bounds are the interpolated p10/p90 (exact `percentile` ↔
    * `quantile_cont` parity, pinned by q15); the middle mass is summed
    * in INTEGER CENTS (values are 2-decimal) so the sum is
    * order-independent, and the winsorized tails contribute as
    * count × bound — two deterministic double products. Same
    * two-aggregation + broadcast-back shape as [[outlierMad]]: no
    * hot-key window, no full sort. */
  def winsorizeEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").select(col("event_type"), col("value"))
    val bounds = e.groupBy("event_type").agg(
      expr(s"percentile(value, $WinsorP)").as("p_lo"),
      expr(s"percentile(value, ${1 - WinsorP})").as("p_hi"))
    e.join(broadcast(bounds), "event_type")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(max("p_lo"), 4).as("p_lo"),
        round(max("p_hi"), 4).as("p_hi"),
        sum(when(col("value") < col("p_lo"), 1L).otherwise(0L))
          .cast("long").as("n_low"),
        sum(when(col("value") > col("p_hi"), 1L).otherwise(0L))
          .cast("long").as("n_high"),
        sum(when(col("value") >= col("p_lo") && col("value") <= col("p_hi"),
          col("cents")).otherwise(0L)).cast("long").as("mid_cents"),
        round(
          (sum(when(col("value") >= col("p_lo") && col("value") <= col("p_hi"),
            col("cents")).otherwise(0L)) / lit(100.0) +
            sum(when(col("value") < col("p_lo"), 1L).otherwise(0L)) * max("p_lo") +
            sum(when(col("value") > col("p_hi"), 1L).otherwise(0L)) * max("p_hi")) /
            count(lit(1)), 4).as("winsor_mean"),
        round(
          sum(when(col("value") >= col("p_lo") && col("value") <= col("p_hi"),
            col("cents")).otherwise(0L)) / lit(100.0) /
            sum(when(col("value") >= col("p_lo") && col("value") <= col("p_hi"),
              1L).otherwise(0L)), 4).as("trimmed_mean"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "outlier_mad" -> outlierMad,
    "winsorize_events" -> winsorizeEvents)

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
        |GROUP BY d.event_type""".stripMargin,
    "winsorize_events" ->
      s"""WITH b AS (
        |  SELECT event_type,
        |    quantile_cont(value, $WinsorP) AS p_lo,
        |    quantile_cont(value, ${1 - WinsorP}) AS p_hi
        |  FROM events GROUP BY event_type),
        |j AS (SELECT e.event_type, e.value, b.p_lo, b.p_hi,
        |        round(e.value * 100)::BIGINT AS cents
        |      FROM events e JOIN b USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  round(max(p_lo), 4) AS p_lo, round(max(p_hi), 4) AS p_hi,
        |  sum(CASE WHEN value < p_lo THEN 1 ELSE 0 END)::BIGINT AS n_low,
        |  sum(CASE WHEN value > p_hi THEN 1 ELSE 0 END)::BIGINT AS n_high,
        |  sum(CASE WHEN value >= p_lo AND value <= p_hi THEN cents
        |      ELSE 0 END)::BIGINT AS mid_cents,
        |  round((sum(CASE WHEN value >= p_lo AND value <= p_hi THEN cents
        |           ELSE 0 END) / 100.0 +
        |         sum(CASE WHEN value < p_lo THEN 1 ELSE 0 END) * max(p_lo) +
        |         sum(CASE WHEN value > p_hi THEN 1 ELSE 0 END) * max(p_hi)) /
        |        count(*), 4) AS winsor_mean,
        |  round(sum(CASE WHEN value >= p_lo AND value <= p_hi THEN cents
        |          ELSE 0 END) / 100.0 /
        |        sum(CASE WHEN value >= p_lo AND value <= p_hi THEN 1
        |            ELSE 0 END), 4) AS trimmed_mean
        |FROM j GROUP BY event_type""".stripMargin)
}
