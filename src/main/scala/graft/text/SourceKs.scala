package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise two-sample Kolmogorov–Smirnov distance between sources'
  * lexical-score distributions — the nonparametric "are these two
  * crawls drawing from the same quality distribution" test a mixing
  * stage runs before assuming sources are exchangeable; the pairwise,
  * distribution-shape complement to [[Drift]]'s per-source
  * time-drift score. Binds the SAME e4 score as the calibration gate
  * ([[QuantileNorm.scored]]), so a KS hit is directly actionable
  * against the calibrated-percentile view.
  *
  * Exactness: KS = max_t |F_a(t) − F_b(t)| over the bounded e4 score
  * domain, computed entirely in integers — per-source inclusive CDFs
  * as cumulative counts over the (source × observed-score) grid, each
  * rescaled to e6 by `(1e6·c) div n` (exact for corpora below ~9.2e12
  * docs — the long-overflow bound, documented). Both engines run the
  * identical integer chain: hash-exact.
  *
  * Scale shape at 100 TB: ONE corpus scan builds the (source, score)
  * histogram with map-side partials (≤ sources × 10,001 cells); every
  * later stage — grid cross join, cumulative window (partitions are
  * per-source slices of a ≤10k-point domain), source-pair join on
  * score, max rollup — runs on DOMAIN-bounded relations, corpus
  * independent. The quantile_norm family shape, extended pairwise. */
object SourceKs {

  /** src_a, src_b, n_a, n_b, ks_e6 (⌊1e6·KS⌋ by construction of the
    * per-side floor divisions — resolution 1e-6). */
  def sourceKs(s: SparkSession, dir: String): DataFrame = {
    val h = QuantileNorm.scored(s, dir)
      .groupBy("source", "score_e4").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // domain-bounded; read 3× below
    val grid = h.select("source").distinct()
      .crossJoin(h.select("score_e4").distinct())
    val wCum = Window.partitionBy("source").orderBy("score_e4")
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = h.groupBy(col("source").as("ns")).agg(sum("cnt").as("n"))
    val cum = grid.join(h, Seq("source", "score_e4"), "left")
      .withColumn("c", sum(coalesce(col("cnt"), lit(0L))).over(wCum))
      .join(broadcast(n), col("source") === col("ns"))
      .select(col("source"), col("score_e4"), col("n"),
        expr("(1000000 * c) div n").as("cdf_e6"))
      // domain-bounded; read by BOTH sides of the pair self-join
      .localCheckpoint(true)
    cum.as("a").join(cum.as("b"),
        col("a.score_e4") === col("b.score_e4") &&
          col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        abs(col("a.cdf_e6") - col("b.cdf_e6")).as("diff"))
      .groupBy("src_a", "src_b", "n_a", "n_b")
      .agg(max("diff").as("ks_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_ks" -> sourceKs)

  val oracles: Map[String, String] = Map(
    "source_ks" ->
      (s"WITH ${QuantileNorm.scoredCteSql},\n" +
        """h AS (
          |  SELECT source, score_e4, count(*)::BIGINT AS cnt FROM sc
          |  GROUP BY source, score_e4),
          |grid AS (
          |  SELECT s.source, t.score_e4
          |  FROM (SELECT DISTINCT source FROM h) s
          |  CROSS JOIN (SELECT DISTINCT score_e4 FROM h) t),
          |n AS (SELECT source, sum(cnt)::BIGINT AS n FROM h GROUP BY 1),
          |cum AS (
          |  SELECT g.source, g.score_e4, n.n,
          |    ((1000000 * sum(coalesce(h.cnt, 0)) OVER (
          |        PARTITION BY g.source ORDER BY g.score_e4
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |      // n.n)::BIGINT AS cdf_e6
          |  FROM grid g
          |  LEFT JOIN h ON h.source = g.source AND h.score_e4 = g.score_e4
          |  JOIN n ON n.source = g.source)
          |SELECT a.source AS src_a, b.source AS src_b,
          |  a.n AS n_a, b.n AS n_b,
          |  max(abs(a.cdf_e6 - b.cdf_e6))::BIGINT AS ks_e6
          |FROM cum a JOIN cum b
          |  ON a.score_e4 = b.score_e4 AND a.source < b.source
          |GROUP BY 1, 2, 3, 4""".stripMargin))
}
