package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention over the events stream — the product-analytics rollup
  * every activity dataset gets: users are grouped by the WEEK of their
  * first event (the cohort), and each later week of activity counts them
  * as retained at that week offset. The (cohort, offset) matrix is the
  * canonical retention triangle.
  *
  * Exactness: week buckets are `date_trunc('week', ts)` (Monday-start in
  * both engines), the offset is integer day-diff ÷ 7 on already-truncated
  * weeks (always a whole multiple — no rounding), and counts are exact
  * distincts — nothing floating-point anywhere.
  *
  * Scale shape at 100 TB: one shuffle by `user_id` (the per-user
  * first-week window — per-user state is one min, and user timelines are
  * bounded), then one partial-aggregated rollup keyed by the TINY
  * (cohort, offset) domain with a distinct-user expand bounded by
  * distinct (cohort, offset, user) triples ≤ user-weeks. No join: the
  * cohort rides the window, so the events relation is scanned once. */
object Cohort {

  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .withColumn("cohort", min("wk").over(w))
      .select(to_date(col("cohort")).as("cohort_week"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cohort_retention" -> cohortRetention)

  val oracles: Map[String, String] = Map(
    "cohort_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |c AS (SELECT user_id, wk,
        |        min(wk) OVER (PARTITION BY user_id) AS cohort
        |      FROM e)
        |SELECT cohort::DATE AS cohort_week,
        |  (date_diff('day', cohort, wk) // 7)::BIGINT AS week_offset,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM c GROUP BY 1, 2""".stripMargin)
}
