package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis — how far each (user, day)
  * progresses through view → click → purchase as an ordered subsequence
  * of that day's events (product analytics' conversion funnel; the same
  * ordered pattern-match a training pipeline uses to mine interaction
  * trajectories). The day scoping is what makes the funnel discriminate:
  * unconstrained, any long-lived user eventually completes every step.
  *
  * Shape: filter to the step types FIRST (the scan drops every other
  * event before any movement), then one shuffle by (user, day) and a
  * per-group sorted fold — the per-group state is one integer, so a
  * 100 TB event log funnels with a single aggregation whose map side
  * already discards non-step events. The fold is over `array_sort` of
  * (ts, type) structs; (user_id, ts) is unique in the events table, so
  * the order — and the result — is fully deterministic and the DuckDB
  * oracle folds the identical sequence. */
object Funnel {

  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  def funnelStages(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .filter(col("event_type").isin(FunnelSteps: _*))
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_type").as("et"))))
        .as("ev"))
      .withColumn("stage", expr(
        """aggregate(ev, 0, (acc, e) -> CASE
          |  WHEN acc = 0 AND e.et = 'view' THEN 1
          |  WHEN acc = 1 AND e.et = 'click' THEN 2
          |  WHEN acc = 2 AND e.et = 'purchase' THEN 3
          |  ELSE acc END)""".stripMargin))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_user_days"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_stages" -> funnelStages)

  val oracles: Map[String, String] = Map(
    "funnel_stages" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('day', ts) AS d, ts, event_type
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |l AS (SELECT user_id, d,
        |        list(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |             ELSE 3 END ORDER BY ts) AS ev
        |      FROM e GROUP BY user_id, d),
        |s AS (SELECT list_reduce(list_prepend(0, ev),
        |        (acc, x) -> CASE
        |          WHEN acc = 0 AND x = 1 THEN 1
        |          WHEN acc = 1 AND x = 2 THEN 2
        |          WHEN acc = 2 AND x = 3 THEN 3
        |          ELSE acc END) AS stage
        |      FROM l)
        |SELECT stage, count(*) AS n_user_days FROM s GROUP BY stage"""
        .stripMargin)
}
