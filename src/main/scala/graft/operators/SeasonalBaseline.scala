package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seasonal-naive anomaly flags — the calendar-profile complement to
  * [[EwmaAnomaly]]'s recency profile: each event is scored against the
  * mean value of ITS OWN (event_type, hour-of-day) cell, so a value
  * that is normal for checkout-at-noon but wild for error-at-3am flags
  * correctly where one global threshold cannot. The classic first
  * baseline of every ops dashboard (seasonal naive; Hyndman &
  * Athanasopoulos's base forecaster) — and the one EWMA misses, because
  * recency smoothing never learns the daily shape.
  *
  * Exactness: values live in integer cents; each cell keeps exact
  * (sum_cents, n) partials and the anomaly test `|v·n − sum| >
  * K·sum`-style float division is avoided by integer cross-
  * multiplication: flag iff `|vc·n − sum_cents| · Den > Num ·
  * sum_cents` is replaced with the fixed multiple form
  * `|vc·n − sum_cents| > (Mult − 1) · sum_cents` — i.e. value beyond
  * [[Mult]]× the cell mean. No division anywhere; hash-exact.
  *
  * Scale shape at 100 TB: one scan → (type × 24)-bounded cell partials
  * (map-side combined), broadcast back over the scan, projection
  * flags. Zero row shuffle beyond the bounded rollup — the
  * doc-profile family law on the events table. */
object SeasonalBaseline {

  /** Flag values beyond Mult× their cell mean. */
  val Mult = 3L

  def seasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        hour(col("ts")).cast("long").as("hod"),
        round(col("value") * 100, 0).cast("long").as("vc"))
    val cells = ev.groupBy("event_type", "hod")
      .agg(sum("vc").as("sum_cents"), count(lit(1)).as("n"))
    ev.join(broadcast(cells), Seq("event_type", "hod"))
      .select(col("event_id"), col("event_type"), col("hod"), col("vc"),
        col("sum_cents"), col("n"),
        (abs(col("vc") * col("n") - col("sum_cents")) >
          lit(Mult - 1) * col("sum_cents")).as("is_anomaly"))
      .filter(col("is_anomaly"))
      .select(col("event_id"), col("event_type"), col("hod"), col("vc"),
        col("sum_cents"), col("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "seasonal_anomaly" -> seasonalAnomaly)

  val oracles: Map[String, String] = Map(
    "seasonal_anomaly" ->
      s"""WITH ev AS (
        |  SELECT event_id, event_type,
        |    hour(ts)::BIGINT AS hod,
        |    round(value * 100)::BIGINT AS vc
        |  FROM events),
        |cells AS (
        |  SELECT event_type, hod, sum(vc)::BIGINT AS sum_cents,
        |    count(*)::BIGINT AS n
        |  FROM ev GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.hod, e.vc,
        |  c.sum_cents, c.n
        |FROM ev e JOIN cells c USING (event_type, hod)
        |WHERE abs(e.vc * c.n - c.sum_cents) > ${Mult - 1} * c.sum_cents"""
        .stripMargin)
}
