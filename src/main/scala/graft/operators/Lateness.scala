package graft.operators

import graft.Tables
import graft.text.TextQueries.hex32
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time lateness profile under a shuffled-arrival stress replay —
  * the audit that SIZES a watermark before anyone writes
  * `withWatermark("ts", "…")`. Production arrival logs are rarely
  * retained, so the standard pessimistic bound replays each user's
  * events in a DETERMINISTIC hash permutation of their ingestion ids
  * (the worst-case-ish arrival a multi-collector merge can produce) and
  * measures how far behind the per-user high-water mark each event
  * lands. The per-bucket histogram of `max(ts so far) − ts` is the
  * distribution a deployment consults to pick a delay that bounds
  * state without dropping data (SURVEY T4's watermarked windows
  * consume the chosen bound). On the ORDERED corpus the same operator
  * degenerates to one bucket-0 row — the replay permutation is what
  * makes the audit informative, and the scaladoc says so rather than
  * pretending the corpus is disordered.
  *
  * Integer arithmetic throughout: lateness in exact epoch-millisecond
  * longs (`unix_millis` ↔ DuckDB `epoch_ms` — no fractional-second
  * cast ambiguity), bucketed to power-of-two MILLISECONDS by the
  * engine's bit-length idiom (`shiftleft(1, length(bin(ms)))` —
  * [[graft.text.Sampling.lengthBuckets]]' no-log2 discipline); on-time
  * events land in bucket 0. The replay permutation is the engine-wide
  * sha256 hash order ([[graft.text.TextQueries.hex32]]), identical in
  * the oracle by construction.
  *
  * Scale shape at 100 TB: ONE user-keyed running-max window (replay
  * order, per-key state is one long) over the event scan, then a
  * bucket rollup with map-side partials (≤ ~64 buckets × partitions).
  * The user-state family law, same exchange as the sessionizers. */
object Lateness {

  def latenessProfile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tms"),
        hex32(concat(lit("arr|"), col("event_id"))).as("arr"))
      .withColumn("late_ms", max("tms").over(w) - col("tms"))
      .select(
        when(col("late_ms") <= 0, 0L)
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), " +
            "length(bin(late_ms)))")).as("late_bucket_ms"))
      .groupBy("late_bucket_ms")
      .agg(count(lit(1)).as("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lateness_profile" -> latenessProfile)

  val oracles: Map[String, String] = Map(
    "lateness_profile" ->
      """WITH l AS (
        |  SELECT (max(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ('0x' || substr(sha256('arr|' || event_id), 1, 8))::BIGINT,
        |        event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |    - epoch_ms(ts) AS late_ms
        |  FROM events),
        |b AS (
        |  SELECT CASE WHEN late_ms <= 0 THEN 0
        |    ELSE (1::BIGINT << length(bin(late_ms))) END::BIGINT
        |    AS late_bucket_ms
        |  FROM l)
        |SELECT late_bucket_ms, count(*)::BIGINT AS n_events
        |FROM b GROUP BY 1""".stripMargin)
}
