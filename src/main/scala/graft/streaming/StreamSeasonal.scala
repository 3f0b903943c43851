package graft.streaming

import graft.operators.SeasonalBaseline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.operators.SeasonalBaseline]] — the live
  * deployment shape of the calendar-profile monitor: the (event_type,
  * hour-of-day) cell baselines are FROZEN from the corpus at rest
  * (retrained on whatever cadence the owner chooses), and each
  * arriving event is scored against its own cell with the same
  * division-free integer cross-multiplication. Stateless stream-static
  * join — no state store, no watermark; micro-batching cannot change a
  * flag, and when the arrivals replay the corpus the flag relation is
  * row-identical to the batch gate (the spec law). */
object StreamSeasonal {

  /** Frozen per-cell baselines of the at-rest corpus. */
  def frozenCells(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "events")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
        round(col("value") * 100, 0).cast("long").as("vc"))
      .groupBy("event_type", "hod")
      .agg(sum("vc").as("sum_cents"), count(lit(1)).as("n"))

  /** Anomaly flags of an (event_id, event_type, ts, value) stream
    * against the frozen cells — the batch gate's exact schema. */
  def flagsOverStream(events: DataFrame, cells: DataFrame): DataFrame =
    events
      .withColumn("hod", hour(col("ts")).cast("long"))
      .withColumn("vc", round(col("value") * 100, 0).cast("long"))
      .join(cells, Seq("event_type", "hod"))
      .filter(abs(col("vc") * col("n") - col("sum_cents")) >
        lit(SeasonalBaseline.Mult - 1) * col("sum_cents"))
      .select(col("event_id"), col("event_type"), col("hod"), col("vc"),
        col("sum_cents"), col("n"))

  def outputMode: OutputMode = OutputMode.Append()
}
