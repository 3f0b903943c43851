package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session entry/exit matrix — which event types OPEN and CLOSE user
  * sessions, and how often a session is a single-event bounce: the
  * product-analytics readout layered on the exact q16 session
  * definition (30-minute inactivity gap), so the session boundary can
  * never drift between the two gates. Entries tell the acquisition
  * surface, exits the abandonment point, bounces the dead-on-arrival
  * rate per entry type.
  *
  * Deterministic by total order: first/last events are row_number = 1
  * under (ts, event_id) asc/desc — the engine-wide unique tiebreak.
  * All counts integer.
  *
  * Scale shape at 100 TB: every window — gap flag, session id running
  * sum, first/last rank — partitions by `user_id` (ONE exchange, AQE
  * reuses it; per-key state is a session counter and a rank); the
  * session rollup keys by (user, session) and the final matrix is
  * event-type-bounded. The user-state family law. */
object SessionEntryExit {

  def sessionEntryExit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val sess = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy("user_id", "session_id")
    val perSession = sess
      .withColumn("rk_first", row_number().over(
        ws.orderBy(asc("ts"), asc("event_id"))))
      .withColumn("rk_last", row_number().over(
        ws.orderBy(desc("ts"), desc("event_id"))))
      .withColumn("n_events", count(lit(1)).over(ws))
      .filter(col("rk_first") === 1 || col("rk_last") === 1)
      .groupBy("user_id", "session_id")
      .agg(min(when(col("rk_first") === 1, col("event_type")))
             .as("first_type"),
           min(when(col("rk_last") === 1, col("event_type")))
             .as("last_type"),
           max("n_events").as("n_events"))
    val types = Tables(s, dir, "events").select(col("event_type")).distinct()
    val entries = perSession.groupBy(col("first_type").as("event_type"))
      .agg(count(lit(1)).as("n_entry"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_single"))
    val exits = perSession.groupBy(col("last_type").as("event_type"))
      .agg(count(lit(1)).as("n_exit"))
    types.join(broadcast(entries), Seq("event_type"), "left")
      .join(broadcast(exits), Seq("event_type"), "left")
      .select(col("event_type"),
        coalesce(col("n_entry"), lit(0L)).as("n_entry"),
        coalesce(col("n_exit"), lit(0L)).as("n_exit"),
        coalesce(col("n_single"), lit(0L)).as("n_single"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "session_entry_exit" -> sessionEntryExit)

  val oracles: Map[String, String] = Map(
    "session_entry_exit" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id)) > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e),
        |rk AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS rk_first,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts DESC, event_id DESC) AS rk_last,
        |    count(*) OVER (PARTITION BY user_id, session_id) AS n_events
        |  FROM sid),
        |ps AS (
        |  SELECT user_id, session_id,
        |    min(CASE WHEN rk_first = 1 THEN event_type END) AS first_type,
        |    min(CASE WHEN rk_last = 1 THEN event_type END) AS last_type,
        |    max(n_events) AS n_events
        |  FROM rk WHERE rk_first = 1 OR rk_last = 1
        |  GROUP BY user_id, session_id),
        |en AS (SELECT first_type AS event_type, count(*)::BIGINT AS n_entry,
        |         sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_single
        |       FROM ps GROUP BY 1),
        |ex AS (SELECT last_type AS event_type, count(*)::BIGINT AS n_exit
        |       FROM ps GROUP BY 1),
        |ty AS (SELECT DISTINCT event_type FROM events)
        |SELECT ty.event_type,
        |  coalesce(en.n_entry, 0)::BIGINT AS n_entry,
        |  coalesce(ex.n_exit, 0)::BIGINT AS n_exit,
        |  coalesce(en.n_single, 0)::BIGINT AS n_single
        |FROM ty LEFT JOIN en USING (event_type)
        |LEFT JOIN ex USING (event_type)""".stripMargin)
}
