package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-session event-type co-occurrence — the session-level basket
  * view: which behaviors happen TOGETHER in one visit (view+click vs
  * view+error), the association signal [[MarketBasket]] reads off
  * order baskets and [[EventPaths]]' transition matrix deliberately
  * ignores (transitions see adjacency; this sees joint presence at any
  * distance within the session). Sessions are the EXACT q16 definition
  * (30-minute gap), shared with [[SessionEntryExit]] so all three
  * session gates bind one boundary.
  *
  * Counts are sessions containing BOTH types (distinct-presence, not
  * occurrence products), plus per-type session counts and the exact
  * integer support fraction against total sessions — all integers +
  * one rounded division.
  *
  * Scale shape at 100 TB: the session id is the same user-keyed window
  * chain as q16 (one exchange); distinct (session, type) collapses
  * occurrences before any pairing, and the in-session self-join emits
  * ≤ C(5, 2) rows per session (event-type domain-bounded) — never
  * occurrence-quadratic. The final matrix is dim²-bounded. */
object SessionTypePairs {

  def sessionTypePairs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val st = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("session_id"), col("event_type"))
      // Basket shape (the market_basket pattern, guide §2.3/§2.4):
      // collect_set both DEDUPS (replacing the former distinct shuffle)
      // and groups per session in one aggregation that reuses the session
      // window's user_id partitioning — zero extra exchange; the pair
      // stage explodes C(types,2) in-task from the sorted set instead of
      // a corpus self-join (sorted + later-elements-only ≡ the former
      // type_a < type_b join condition).
      .groupBy("user_id", "session_id")
      .agg(array_sort(collect_set(col("event_type"))).as("ts"))
      .localCheckpoint(true) // read 3×: totals, singles, pair explode
    val nSessions = st.count()
    val singles = st.select(explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    st.select(explode(expr(
        "flatten(transform(ts, (x, i) -> " +
          "transform(slice(ts, i + 2, size(ts)), " +
          "y -> struct(x AS type_a, y AS type_b))))")).as("p"))
      .groupBy(col("p.type_a").as("type_a"),
        col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(singles.withColumnRenamed("t", "type_a")
        .withColumnRenamed("n", "n_a")), Seq("type_a"))
      .join(broadcast(singles.withColumnRenamed("t", "type_b")
        .withColumnRenamed("n", "n_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both") / lit(nSessions.toDouble), 4).as("support"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "session_type_pairs" -> sessionTypePairs)

  val oracles: Map[String, String] = Map(
    "session_type_pairs" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id)) > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |st AS (
        |  SELECT DISTINCT user_id, event_type,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e),
        |ns AS (SELECT count(*) AS n FROM (
        |         SELECT DISTINCT user_id, session_id FROM st)),
        |singles AS (SELECT event_type AS t, count(*)::BIGINT AS n
        |            FROM st GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*)::BIGINT AS n_both
        |  FROM st a JOIN st b
        |    ON a.user_id = b.user_id AND a.session_id = b.session_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
        |  round(p.n_both * 1.0 / (SELECT n FROM ns), 4) AS support
        |FROM pairs p
        |JOIN singles sa ON sa.t = p.type_a
        |JOIN singles sb ON sb.t = p.type_b""".stripMargin)
}
