package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Month-over-month revenue change — the first chart of every BI
  * deployment: monthly discounted revenue (the q1/q3 money idiom:
  * `Σ extendedprice·(1−discount)` rounded once at the output boundary),
  * the previous month via `lag`, and the absolute/relative deltas. The
  * percentage divides the two ALREADY-ROUNDED month totals, so both
  * engines divide identical doubles — deterministic without any float
  * accumulation subtlety beyond what the long-green q1/q3 gates
  * already bind.
  *
  * Scale shape at 100 TB: one lineitem scan → month-keyed partials
  * (map-side combined, ≤ ~84 months per 7-year corpus); the lag window
  * and deltas run over that domain-bounded month relation, never over
  * facts — the same bounded-window discipline as the sweep-line
  * backlog. */
object RevenueMom {

  def revenueMom(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(s, dir, "lineitem")
      .select(date_trunc("month", col("l_shipdate")).cast("date").as("month"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy("month")
      .agg(round(sum("rev"), 2).as("revenue"))
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev_revenue", lag("revenue", 1).over(w))
      .withColumn("delta", round(col("revenue") - col("prev_revenue"), 2))
      .withColumn("pct_change",
        when(col("prev_revenue") > 0,
          round(col("delta") / col("prev_revenue"), 4)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_revenue_mom" -> revenueMom)

  val oracles: Map[String, String] = Map(
    "q26_revenue_mom" ->
      """WITH m AS (
        |  SELECT date_trunc('month', l_shipdate)::DATE AS month,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1),
        |l AS (
        |  SELECT month, revenue,
        |    lag(revenue) OVER (ORDER BY month) AS prev_revenue
        |  FROM m)
        |SELECT month, revenue, prev_revenue,
        |  round(revenue - prev_revenue, 2) AS delta,
        |  CASE WHEN prev_revenue > 0
        |    THEN round(round(revenue - prev_revenue, 2) / prev_revenue, 4)
        |  END AS pct_change
        |FROM l""".stripMargin)
}
