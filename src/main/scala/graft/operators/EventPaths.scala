package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path operators over the user event stream: the first-order
  * Markov transition matrix (clickstream "what follows what") and the
  * SCD type-2 dimension build (versioned validity intervals per key) —
  * the two warehouse views the reference's sessionizer family
  * (`internal/validate/validate.go`, session tests) stops short of.
  *
  * Both ride ONE window partitioned by `user_id` ordered by
  * (ts, event_id) — per-key state is a single `lead`, hash-partitioned
  * by user, linear in events at any scale (the `user-state` family law).
  * The tiebreak on the unique event_id makes the ordering total, so
  * both outputs are deterministic and cross-engine hash-exact. */
object EventPaths {

  /** First-order transition counts + row-stochastic probabilities:
    * consecutive (event_type → next event_type) per user. The matrix
    * is event-type²-bounded (25 cells here), so the per-from totals
    * broadcast back; p keeps one exact integer-to-integer double
    * division, rounded for cross-engine repr stability. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val steps = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    val trans = steps.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val fromTot = trans.groupBy(col("from_type").as("ft"))
      .agg(sum("n_transitions").as("n_from"))
    trans.join(broadcast(fromTot), col("from_type") === col("ft")).drop("ft")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        col("n_from"),
        round(col("n_transitions").cast("double") /
          col("n_from").cast("double"), 6).as("p"))
  }

  /** SCD type-2 build: each user's `value` history as versioned
    * [valid_from, valid_to) intervals — valid_to is the next change's
    * timestamp, NULL on the current row. Output ∝ events (linear);
    * the window is the same user-keyed lead as the transition matrix. */
  def scd2Build(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("version"),
        col("ts").as("valid_from"), col("valid_to"),
        col("value"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_transitions" -> eventTransitions,
    "scd2_build" -> scd2Build)

  val oracles: Map[String, String] = Map(
    "event_transitions" ->
      """WITH steps AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |trans AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
        |  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, sum(n_transitions)::BIGINT AS n_from
        |       FROM trans GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n_transitions, ft.n_from,
        |  round(t.n_transitions::DOUBLE / ft.n_from::DOUBLE, 6) AS p
        |FROM trans t JOIN ft USING (from_type)""".stripMargin,
    "scd2_build" ->
      """SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id)::BIGINT AS version,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to,
        |  value,
        |  (CASE WHEN lead(ts) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0
        |   END)::BIGINT AS is_current
        |FROM events""".stripMargin)
}
