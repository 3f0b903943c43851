package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily open-order backlog — how many orders are placed but not yet
  * fully shipped on each calendar day: the classic operations curve
  * (intake vs fulfillment capacity) built with the SWEEP-LINE pattern,
  * the scale idiom every interval-accounting problem wants: instead of
  * joining every order against every day it spans (days × orders — the
  * quadratic trap), each order contributes exactly TWO delta rows
  * (+1 at placement, −1 the day after its last line ships) and one
  * cumulative sum over the date axis replays the whole curve.
  *
  * An order with no line items stays open forever (left join keeps its
  * +1 with no matching −1) — the honest semantics for a malformed
  * order rather than silently dropping it. The synthetic generator
  * draws ship dates independently of order dates, so some orders
  * "ship" before placement; the close day clamps to
  * `greatest(last_ship, o_orderdate)` (an order cannot close before it
  * opens), which also keeps the sweep-line identical to the direct
  * interval count — the law the spec probes.
  *
  * All integer/date arithmetic. Scale shape at 100 TB: one lineitem
  * scan → per-order max-shipdate partials (map-side combined, keyed by
  * order), one orders scan, the delta union pre-aggregated BY DATE
  * (≤ a few thousand distinct days — domain-bounded), and the final
  * cumulative window runs over that bounded date relation, never over
  * facts. */
object Backlog {

  def orderBacklogDaily(s: SparkSession, dir: String): DataFrame = {
    val lastShip = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(col("l_shipdate").cast("date")).as("last_ship"))
    val orders = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .join(lastShip, Seq("o_orderkey"), "left")
    val deltas = orders.select(col("o_orderdate").as("d"), lit(1L).as("dl"))
      .unionByName(orders.filter(col("last_ship").isNotNull)
        .select(date_add(greatest(col("last_ship"), col("o_orderdate")), 1)
          .as("d"), lit(-1L).as("dl")))
      .groupBy("d").agg(sum("dl").as("delta"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("open_backlog", sum("delta").over(w))
      .select(col("d").as("day"), col("delta"), col("open_backlog"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "order_backlog_daily" -> orderBacklogDaily)

  val oracles: Map[String, String] = Map(
    "order_backlog_daily" ->
      """WITH last_ship AS (
        |  SELECT l_orderkey AS o_orderkey, max(l_shipdate::DATE) AS last_ship
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT orders.o_orderkey, o_orderdate::DATE AS o_orderdate,
        |        ls.last_ship
        |      FROM orders LEFT JOIN last_ship ls USING (o_orderkey)),
        |deltas AS (
        |  SELECT d, sum(dl)::BIGINT AS delta FROM (
        |    SELECT o_orderdate AS d, 1 AS dl FROM o
        |    UNION ALL
        |    SELECT greatest(last_ship, o_orderdate) + 1 AS d, -1 AS dl
        |    FROM o WHERE last_ship IS NOT NULL)
        |  GROUP BY d)
        |SELECT d AS day, delta,
        |  sum(delta) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS open_backlog
        |FROM deltas""".stripMargin)
}
