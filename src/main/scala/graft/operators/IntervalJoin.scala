package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join — for each left row, all right rows of the same
  * key whose timestamp falls in `[left.ts + lower, left.ts + upper)`. The
  * Flink-style enrichment join (click attribution, feature lookback
  * windows) that Spark has no native operator for: a naive `a.ts BETWEEN
  * b.ts + x AND b.ts + y` condition on top of a key equality is fine —
  * Catalyst plans it as an equi-join with the range as a post-filter — but
  * the *skew shape* is wrong at 100 TB: every row of a hot key meets every
  * other row of that key before the range filter runs.
  *
  * The scalable composition used here buckets both sides by
  * `floor(ts / window)` where `window = upper - lower`, so a pair can only
  * match if the right row lands in one of (at most) two adjacent buckets of
  * the left row. Joining on `(key, bucket)` with the exact range predicate
  * as a residual makes the pre-filter blowup per key-bucket instead of per
  * key: for time-skewed streams (the common case — key skew is usually
  * traffic skew spread over time) the candidate set shrinks by
  * `total_span / window`. Each matching pair is produced exactly once
  * because the right side has one bucket and the left side's candidate
  * buckets are distinct.
  *
  * Reference scope note: the reference has no join in its hot path
  * (SURVEY.md §2.9); this is part of the LLM-pipeline extension surface,
  * like [[AsOfJoin]].
  */
object IntervalJoin {

  /** Join `left` and `right` on `left(key) === right(key)` and
    * `right(ts) ∈ [left(ts) + lowerUs, left(ts) + upperUs)` (microsecond
    * bounds, half-open). Column name collisions are the caller's problem —
    * pass pre-aliased frames, the result carries all columns of both sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, s"empty interval [$lowerUs, $upperUs)")
    // subtractExact: an overflowing bound pair would otherwise produce a
    // negative window and silently wrong buckets — fail fast instead
    val window = Math.subtractExact(upperUs, lowerUs)
    // exact floored long division, end to end in integer arithmetic:
    // subtract the floored modulus (pmod) then `div` (integral division —
    // exact because the numerator is a multiple of window). floor(c / w)
    // as a double division could misbucket a boundary value once |c|
    // outgrows the 53-bit mantissa, exactly the kind of bug a 100 TB
    // corpus with far-past/far-future timestamps would hit.
    def bucket(e: String): String =
      s"(($e) - pmod($e, ${window}L)) div ${window}L"
    // right row bucket: where its own ts lands
    val r = right.withColumn("_ij_us", unix_micros(col(rightTs)))
      .withColumn("_ij_bucket", expr(bucket("_ij_us")))
    // left row candidate buckets: the window [ts+lower, ts+upper) spans at
    // most two buckets of width `window`; explode the distinct set
    val l = left.withColumn("_ij_us", unix_micros(col(leftTs)))
      .withColumn("_ij_bucket", explode(array_distinct(array(
        expr(bucket(s"_ij_us + ${lowerUs}L")),
        expr(bucket(s"_ij_us + ${upperUs}L - 1L"))))))
    val joined = l.as("l").join(r.as("r"),
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col("l._ij_bucket") === col("r._ij_bucket") &&
        col("r._ij_us") >= col("l._ij_us") + lit(lowerUs) &&
        col("r._ij_us") < col("l._ij_us") + lit(upperUs))
    joined.drop("_ij_us", "_ij_bucket")
  }

  /** Gate query: for each purchase, the clicks of the same user in the
    * preceding 6 hours — count, latest click time, max click id. */
  def purchaseClickAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_event_id"))
    val H6 = 6L * 3600 * 1000000
    intervalJoin(purchases, clicks,
      "user_id", "c_user_id", "ts", "c_ts", -H6, 0L)
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_clicks"),
        max("c_ts").as("last_click_ts"),
        max("c_event_id").as("max_click_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "interval_join" -> purchaseClickAttribution)

  val oracles: Map[String, String] = Map(
    "interval_join" ->
      """SELECT p.event_id AS purchase_id, count(*)::BIGINT AS n_clicks,
        |  max(c.ts) AS last_click_ts, max(c.event_id) AS max_click_id
        |FROM events p JOIN events c ON c.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 6 HOUR AND c.ts < p.ts
        |GROUP BY 1""".stripMargin)
}
