package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — the credit-assignment pass marketing/
  * conversion analytics runs after the attribution join: for each
  * purchase, every click by the same user in the prior
  * [[WindowUs]]-microsecond window is a TOUCH, and the purchase's credit
  * is split across touches under two standard models:
  *
  *  - '''linear''': every touch gets 1/n;
  *  - '''position-based''' (the "U-shaped" 40/20/40 model): first and
  *    last touch get 0.4 each, the middle splits 0.2 evenly; n=1 gets
  *    1.0, n=2 splits 0.5/0.5.
  *
  * Both models are exact-literal arithmetic over integer ranks — no
  * `pow`, no float accumulation — so the oracle is exact hash equality.
  * (A half-life time-decay model needs `pow` with fractional exponents,
  * which IEEE does NOT require correctly rounded — the rank-based
  * position model is the hash-exact member of that family.)
  *
  * Scale shape: the touch relation rides [[IntervalJoin.intervalJoin]]'s
  * bucketed composition (candidate pairs per (user, time-bucket), never
  * per user), and the rank/count windows partition by purchase — bounded
  * by touches-per-purchase, never corpus-wide. */
object Attribution {

  /** Attribution lookback: 1 hour (microseconds). */
  val WindowUs: Long = 3600L * 1000000L

  def attributionWeights(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    // clicks with c_ts ∈ [p_ts − Window, p_ts] (upper bound +1µs keeps
    // the half-open join inclusive of the purchase instant)
    val touches = IntervalJoin.intervalJoin(purchases, clicks,
      "p_user", "c_user", "p_ts", "c_ts", -WindowUs, 1L)
    val byPurchase = Window.partitionBy("purchase_id")
    val order = Window.partitionBy("purchase_id")
      .orderBy(col("c_ts").desc, col("click_id").desc)
    val n = col("n_touches")
    val r = col("rank_from_last")
    touches
      .withColumn("n_touches", count(lit(1)).over(byPurchase))
      .withColumn("rank_from_last", row_number().over(order).cast("long"))
      .select(col("purchase_id"), col("click_id"),
        col("n_touches"), col("rank_from_last"),
        round(lit(1.0) / n, 6).as("w_linear"),
        round(
          when(n === 1, 1.0)
            .when(n === 2, 0.5)
            .when(r === 1 || r === n, 0.4)
            .otherwise(lit(0.2) / (n - 2)), 6).as("w_position"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution_weights" -> attributionWeights)

  val oracles: Map[String, String] = Map(
    "attribution_weights" ->
      s"""WITH t AS (
        |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |    c.ts AS c_ts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |   AND epoch_us(c.ts) >= epoch_us(p.ts) - $WindowUs
        |   AND epoch_us(c.ts) <= epoch_us(p.ts)),
        |w AS (
        |  SELECT purchase_id, click_id,
        |    count(*) OVER (PARTITION BY purchase_id) AS n_touches,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY c_ts DESC, click_id DESC) AS rank_from_last
        |  FROM t)
        |SELECT purchase_id, click_id, n_touches, rank_from_last,
        |  round(1.0 / n_touches, 6) AS w_linear,
        |  round(CASE WHEN n_touches = 1 THEN 1.0
        |             WHEN n_touches = 2 THEN 0.5
        |             WHEN rank_from_last = 1 OR rank_from_last = n_touches
        |               THEN 0.4
        |             ELSE 0.2 / (n_touches - 2) END, 6) AS w_position
        |FROM w""".stripMargin)
}
