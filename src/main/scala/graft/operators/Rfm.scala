package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM customer segmentation — recency / frequency / monetary quartile
  * scores per customer, the classic marketing-analytics rollup
  * (reference ships group-by-count rollups over typed entities,
  * `internal/validate/validate.go:53`; this is the scoring tier a
  * warehouse builds on top of them).
  *
  * The scale-correct part is HOW the quartiles are computed. The naive
  * `ntile(4) OVER (ORDER BY metric)` is a single-partition global sort
  * of every customer — the canonical 100 TB trap. Instead each metric
  * is reduced to a BOUNDED-DOMAIN value histogram (`groupBy(value)` —
  * shuffle ∝ distinct values, not rows), the cumulative
  * count-strictly-less is taken with one window over that histogram,
  * and the quartile index is the exact integer `(4·cnt_less) div n` —
  * ties share a score, order-independent, cross-engine exact. The three
  * tiny score tables broadcast back onto the customer relation. Domains
  * are bounded by construction: recency in days (calendar-bounded),
  * frequency (orders per customer), and monetary quantized to WHOLE
  * DOLLARS for scoring (price-domain-bounded) while the output keeps
  * exact integer cents (order-independent sums, no float-sum hash
  * risk). */
object Rfm {

  /** Quartile index 0..3 per distinct value of `c`: the number of
    * complete quarters of the population strictly below the value.
    * `n1` is a one-row (n BIGINT) relation, broadcast. */
  private def quartileIdx(cust: DataFrame, c: String, n1: DataFrame): DataFrame = {
    val h = cust.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cnt_less", coalesce(sum("cnt").over(w), lit(0L)))
      .crossJoin(broadcast(n1))
      .select(col("v"), expr("(4 * cnt_less) div n").cast("long").as("idx"))
  }

  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(
      col("o_custkey"), col("o_orderdate"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val anchor = o.agg(max("o_orderdate").as("amax"))
    val cust = o.groupBy(col("o_custkey").as("custkey"))
      .agg(max("o_orderdate").as("omax"),
        count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .select(col("custkey"),
        datediff(col("amax"), col("omax")).cast("long").as("recency_days"),
        col("frequency"),
        col("monetary_cents"),
        expr("monetary_cents div 100").cast("long").as("m_dollars"))
      // read 5× (population count, three metric histograms, the final
      // score join) — materialize the per-customer base once instead of
      // re-running the orders aggregation per consumer
      .localCheckpoint(true)
    val n1 = cust.agg(count(lit(1)).as("n"))
    val rq = quartileIdx(cust, "recency_days", n1)
    val fq = quartileIdx(cust, "frequency", n1)
    val mq = quartileIdx(cust, "m_dollars", n1)
    val rqr = rq.select(col("v").as("rv"), col("idx").as("r_idx"))
    val fqr = fq.select(col("v").as("fv"), col("idx").as("f_idx"))
    val mqr = mq.select(col("v").as("mv"), col("idx").as("m_idx"))
    cust
      .join(broadcast(rqr), col("recency_days") === col("rv")).drop("rv")
      .join(broadcast(fqr), col("frequency") === col("fv")).drop("fv")
      .join(broadcast(mqr), col("m_dollars") === col("mv")).drop("mv")
      .select(col("custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        // Recent = LOW recency_days, so the R score inverts its quartile.
        (lit(4L) - col("r_idx")).cast("long").as("r_score"),
        (col("f_idx") + 1L).cast("long").as("f_score"),
        (col("m_idx") + 1L).cast("long").as("m_score"))
      .withColumn("segment",
        when(col("r_score") === 4 && col("f_score") === 4, "champion")
          .when(col("r_score") >= 3 && col("f_score") >= 3, "loyal")
          .when(col("r_score") >= 3, "recent")
          .when(col("f_score") >= 3, "at_risk")
          .when(col("r_score") === 1 && col("f_score") === 1, "hibernating")
          .otherwise("needs_attention"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rfm_segments" -> rfmSegments)

  val oracles: Map[String, String] = Map(
    "rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate,
        |         round(o_totalprice * 100)::BIGINT AS cents
        |  FROM orders),
        |anchor AS (SELECT max(o_orderdate) AS amax FROM o),
        |cust AS (
        |  SELECT o_custkey AS custkey,
        |    datediff('day', max(o_orderdate),
        |             (SELECT amax FROM anchor))::BIGINT AS recency_days,
        |    count(*)::BIGINT AS frequency,
        |    sum(cents)::BIGINT AS monetary_cents,
        |    (sum(cents)::BIGINT // 100)::BIGINT AS m_dollars
        |  FROM o GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n FROM cust),
        |rq AS (
        |  SELECT v, ((4 * cnt_less) // n)::BIGINT AS idx FROM (
        |    SELECT recency_days AS v, coalesce(sum(count(*)) OVER
        |      (ORDER BY recency_days
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cnt_less
        |    FROM cust GROUP BY recency_days), tot),
        |fq AS (
        |  SELECT v, ((4 * cnt_less) // n)::BIGINT AS idx FROM (
        |    SELECT frequency AS v, coalesce(sum(count(*)) OVER
        |      (ORDER BY frequency
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cnt_less
        |    FROM cust GROUP BY frequency), tot),
        |mq AS (
        |  SELECT v, ((4 * cnt_less) // n)::BIGINT AS idx FROM (
        |    SELECT m_dollars AS v, coalesce(sum(count(*)) OVER
        |      (ORDER BY m_dollars
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cnt_less
        |    FROM cust GROUP BY m_dollars), tot),
        |scored AS (
        |  SELECT c.custkey, c.recency_days, c.frequency, c.monetary_cents,
        |    (4 - rq.idx)::BIGINT AS r_score,
        |    (fq.idx + 1)::BIGINT AS f_score,
        |    (mq.idx + 1)::BIGINT AS m_score
        |  FROM cust c
        |  JOIN rq ON c.recency_days = rq.v
        |  JOIN fq ON c.frequency = fq.v
        |  JOIN mq ON c.m_dollars = mq.v)
        |SELECT custkey, recency_days, frequency, monetary_cents,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score = 4 AND f_score = 4 THEN 'champion'
        |       WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
        |       WHEN r_score >= 3 THEN 'recent'
        |       WHEN f_score >= 3 THEN 'at_risk'
        |       WHEN r_score = 1 AND f_score = 1 THEN 'hibernating'
        |       ELSE 'needs_attention' END AS segment
        |FROM scored""".stripMargin)
}
