package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-user EWMA anomaly flags over the event stream — the classic
  * online monitoring readout (Roberts 1959 EWMA control charts): an
  * event is anomalous when its value deviates from the exponentially
  * weighted average of the user's recent history by more than a fixed
  * band.
  *
  * Deliberately EXACT across engines: the usual recursive
  * `ewma = α·x + (1−α)·ewma` accumulates float error whose last ulp
  * depends on chain length, so instead the smoother is the TRUNCATED
  * dyadic EWMA over the last [[W]] events with α = 1/2 — weight 2^(W−i)
  * for lag i — computed from integer cents:
  * `num = Σ vc(t−i)·2^(W−i)`, `den = Σ 2^(W−i)` over the lags present.
  * The anomaly test is the integer cross-multiplication
  * `|vc·den − num| > ThresholdCents·den` (never a float division), and
  * events with fewer than [[MinHist]] prior observations are never
  * flagged (no baseline yet). Everything is BIGINT end to end.
  *
  * Scale shape at 100 TB: ONE user-keyed window pass (the `user-state`
  * family: hash by user, per-key state is W lags) — shuffle ∝ events,
  * state O(W) per user, no self-join, no global sort. The streaming
  * face ([[graft.streaming.StreamEwma]]) carries the same last-W ring
  * buffer per user through `flatMapGroupsWithState` — the true
  * deployment shape, O(W) bytes of state per key. */
object EwmaAnomaly {

  /** Truncated-EWMA window length (lags). */
  val W = 8

  /** Minimum prior events before an anomaly can be declared. */
  val MinHist = 4

  /** Deviation band in integer cents. */
  val ThresholdCents = 12000L

  /** Weight of lag i (1-based): 2^(W−i). */
  def weight(i: Int): Long = 1L << (W - i)

  def ewmaAnomaly(s: SparkSession, dir: String): DataFrame = {
    val v = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100, 0).cast("long").as("vc"),
        col("ts"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val lags: Seq[Column] =
      (1 to W).map(i => lag(col("vc"), i).over(w).as(s"l$i"))
    val withLags = v.select(col("event_id") +: col("user_id") +:
      col("vc") +: lags: _*)
    val num = (1 to W).map(i =>
      coalesce(col(s"l$i") * lit(weight(i)), lit(0L))).reduce(_ + _)
    val den = (1 to W).map(i =>
      when(col(s"l$i").isNull, 0L).otherwise(weight(i))).reduce(_ + _)
    withLags
      .withColumn("num", num.cast("long"))
      .withColumn("den", den.cast("long"))
      .select(col("event_id"), col("user_id"), col("vc"),
        col("num"), col("den"),
        (col(s"l$MinHist").isNotNull &&
          abs(col("vc") * col("den") - col("num")) >
            lit(ThresholdCents) * col("den")).as("is_anomaly"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ewma_anomaly" -> ewmaAnomaly)

  private val lagCols = (1 to W).map(i =>
    s"lag(vc,$i) OVER w AS l$i").mkString(", ")
  private val numSql = (1 to W).map(i =>
    s"coalesce(l$i*${weight(i)},0)").mkString("+")
  private val denSql = (1 to W).map(i =>
    s"(CASE WHEN l$i IS NULL THEN 0 ELSE ${weight(i)} END)").mkString("+")

  val oracles: Map[String, String] = Map(
    "ewma_anomaly" ->
      s"""WITH v AS (
        |  SELECT event_id, user_id, ts,
        |    round(value*100)::BIGINT AS vc FROM events),
        |l AS (
        |  SELECT event_id, user_id, vc, $lagCols
        |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |e AS (
        |  SELECT event_id, user_id, vc,
        |    ($numSql)::BIGINT AS num,
        |    ($denSql)::BIGINT AS den,
        |    l$MinHist IS NOT NULL AS hist
        |  FROM l)
        |SELECT event_id, user_id, vc, num, den,
        |  (hist AND abs(vc*den - num) > $ThresholdCents*den) AS is_anomaly
        |FROM e""".stripMargin)
}
