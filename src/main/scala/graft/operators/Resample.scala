package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with forward fill — align every user's irregular
  * event stream onto a uniform daily grid, carrying the last observed
  * value forward (the gap-filling step before any windowed feature
  * extraction or as-of training-label join).
  *
  * Shape: the grid is `users × sequence(days)` (a generate + explode, no
  * shuffle), unioned with the real events and swept by ONE ordered window
  * per user — `last(value, ignoreNulls)` over rows-unbounded-preceding is
  * the forward fill. Grid rows sort AFTER a real event at the same
  * instant ((ts, is_grid) ordering), so a midnight event is picked up by
  * that day's point, and (user_id, ts) uniqueness makes the whole sweep
  * deterministic. One shuffle by user at 100 TB; grid size is
  * users × days, independent of event volume. Days before a user's first
  * event stay null (emitted — the consumer decides). */
object Resample {

  def resampleFfill(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val span = e.agg(
      date_trunc("day", min("ts")).as("d0"),
      date_trunc("day", max("ts")).as("d1"))
    val grid = e.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("ts"))
      .withColumn("is_grid", lit(1))
      .withColumn("value", lit(null).cast("double"))
    val union = e.withColumn("is_grid", lit(0))
      .select("user_id", "ts", "value", "is_grid")
      .unionByName(grid.select("user_id", "ts", "value", "is_grid"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union
      .withColumn("ffill", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        round(col("ffill"), 2).as("value_ffill"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "resample_ffill" -> resampleFfill)

  val oracles: Map[String, String] = Map(
    "resample_ffill" ->
      """WITH span AS (
        |  SELECT date_trunc('day', min(ts)) AS d0,
        |         date_trunc('day', max(ts)) AS d1
        |  FROM events),
        |grid AS (
        |  SELECT u.user_id, g.ts, 1 AS is_grid, NULL::DOUBLE AS value
        |  FROM (SELECT DISTINCT user_id FROM events) u,
        |       (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS ts
        |        FROM span) g),
        |u AS (
        |  SELECT user_id, ts, value, 0 AS is_grid FROM events
        |  UNION ALL
        |  SELECT user_id, ts, value, is_grid FROM grid),
        |f AS (
        |  SELECT user_id, ts, is_grid,
        |    last_value(value IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, is_grid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
        |  FROM u)
        |SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |  round(ffill, 2) AS value_ffill
        |FROM f WHERE is_grid = 1""".stripMargin)
}
