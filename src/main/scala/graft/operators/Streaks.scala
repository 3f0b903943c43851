package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-and-islands day streaks per user — the engagement shape the
  * sessionizer family (reference `internal/validate/validate.go`
  * session tests; our `q16_sessionize`/`q24_session_window`) stops
  * short of: q16 islands CONSECUTIVE EVENTS by time gap, this islands
  * CONSECUTIVE CALENDAR DAYS of activity, the "daily active streak"
  * view every retention dashboard reads next to [[Cohort]].
  *
  * Technique: the classic `date − row_number()` island key — for each
  * user's distinct active days ordered ascending, `epoch_day − rn` is
  * constant exactly while days are consecutive, so one window + one
  * groupBy yields the islands. Everything is integer/date arithmetic
  * (epoch-day via datediff from a fixed literal) — cross-engine
  * hash-exact with no float anywhere.
  *
  * Scale shape at 100 TB: the distinct (user, day) relation is one
  * shuffle with map-side partials (bounded by users × days, far below
  * event count); the window, island groupBy, and per-user rollup all
  * partition by `user_id` — the same key, so AQE reuses one exchange.
  * Per-user state is days-bounded (≤ a few thousand rows per user),
  * never event-bounded: no hot-key window on an unbounded partition. */
object Streaks {

  /** Per-user streak profile: active day count, number of maximal
    * consecutive-day runs, longest run length, and the (earliest)
    * start date of a longest run. */
  def userStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = Tables(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    val islands = days
      .withColumn("rn", row_number().over(w))
      .withColumn("grp",
        datediff(col("d"), lit("2024-01-01").cast("date")) - col("rn"))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("d").as("start"))
    val mx = Window.partitionBy("user_id")
    islands
      .withColumn("max_len", max("len").over(mx))
      .groupBy("user_id")
      .agg(sum("len").cast("long").as("active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").cast("long").as("longest_streak"),
        min(when(col("len") === col("max_len"), col("start")))
          .as("longest_start"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "user_streaks" -> userStreaks)

  val oracles: Map[String, String] = Map(
    "user_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (
        |  SELECT user_id,
        |    (d - DATE '2024-01-01')
        |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp,
        |    d
        |  FROM days),
        |runs AS (
        |  SELECT user_id, grp, count(*)::BIGINT AS len, min(d) AS start
        |  FROM isl GROUP BY 1, 2),
        |mx AS (
        |  SELECT user_id, grp, len, start,
        |    max(len) OVER (PARTITION BY user_id) AS max_len
        |  FROM runs)
        |SELECT user_id, sum(len)::BIGINT AS active_days,
        |  count(*)::BIGINT AS n_streaks,
        |  max(len)::BIGINT AS longest_streak,
        |  min(CASE WHEN len = max_len THEN start END) AS longest_start
        |FROM mx GROUP BY user_id""".stripMargin)
}
