package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the operator feature pipelines need for
  * training-data correctness: for each left-side event, the most recent
  * right-side row with `ts <= left.ts` per key.
  *
  * Spark has no native ASOF join; the scalable composition (preference (a)
  * of the build guidelines) is union-tag + ordered window with
  * `last(ignoreNulls)`: one shuffle on the key, one sort per partition —
  * O(n log n) per key group, no range-join explosion. DuckDB 1.0 has a
  * native `ASOF JOIN`, which the oracle uses, so the composition's
  * semantics (greatest right.ts <= left.ts, ties right-before-left) are
  * cross-checked exactly.
  */
object AsOfJoin {

  /** For each purchase event: the most recent prior-or-simultaneous click
    * value of the same user. Left rows without a prior click keep null. */
  def purchasesWithLastClick(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
        col("value").as("click_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), col("value"),
        lit(null).cast("double").as("click_value"))
    // side=0 sorts before side=1 at equal ts: a click at exactly the
    // purchase timestamp counts as "prior" (matches ASOF's ts >= ts)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE window value binds both output columns: last(struct) over the
    // click rows, so ts and value always come from the SAME click row
    // even if a click carries a NULL value (separate last(value) /
    // last(when(ts)) calls would skip the null on one column only and
    // diverge from the oracle's single matched row).
    clicks.unionByName(purchases)
      .withColumn("last_click",
        last(when(col("side") === 0, struct(col("ts"), col("click_value"))),
          ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("purchase_value"),
        round(col("last_click.click_value"), 2).as("last_click_value"),
        (unix_micros(col("ts")) - unix_micros(col("last_click.ts")))
          .as("micros_since_click"))
  }

  /** FORWARD as-of: for each click, the first purchase with
    * `ts >= click.ts` of the same user — time-to-conversion, the
    * attribution metric's mirror image. Same union-tag composition with
    * the window frame reversed (currentRow → unboundedFollowing,
    * `first(ignoreNulls)`); a purchase at exactly the click timestamp
    * counts as "next" (purchase sorts after the click at equal ts,
    * matching ASOF's `ts <= ts`). Identical scale shape to the backward
    * join: one key shuffle, one per-partition sort. */
  def clicksWithNextPurchase(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id"), col("value"),
        lit(null).cast("double").as("purchase_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
        col("value").as("purchase_value"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // first(struct) — same single-row binding as the backward join
    clicks.unionByName(purchases)
      .withColumn("next_purchase",
        first(when(col("side") === 1, struct(col("ts"), col("purchase_value"))),
          ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("click_value"),
        round(col("next_purchase.purchase_value"), 2).as("next_purchase_value"),
        (unix_micros(col("next_purchase.ts")) - unix_micros(col("ts")))
          .as("micros_to_purchase"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> purchasesWithLastClick,
    "asof_join_forward" -> clicksWithNextPurchase)

  val oracles: Map[String, String] = Map(
    "asof_join" ->
      """SELECT p.event_id, p.user_id,
        |  round(p.value, 2) AS purchase_value,
        |  round(c.value, 2) AS last_click_value,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS micros_since_click
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    // DuckDB's ASOF accepts <= for the forward direction — the native
    // cross-check of the reversed-frame composition
    "asof_join_forward" ->
      """SELECT c.event_id, c.user_id,
        |  round(c.value, 2) AS click_value,
        |  round(p.value, 2) AS next_purchase_value,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS micros_to_purchase
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin)
}
