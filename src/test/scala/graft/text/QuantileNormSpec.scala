package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Replays the min-rank percentile definition exhaustively driver-side:
  * for every document, pct_e6 must equal (1e6 · |scores in the same
  * source strictly below|) div (n_source − 1) — the histogram-CDF path
  * in the engine must be indistinguishable from the naive per-source
  * sort it replaces. */
class QuantileNormSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("histogram-CDF percentiles equal the naive per-source rank") {
    val rows = QuantileNorm.qualityQuantileNorm(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(1))
    for (r <- rows) {
      val peers = bySource(r.getString(1)).map(_.getLong(2))
      val n = peers.length
      val less = peers.count(_ < r.getLong(2))
      val want = if (n > 1) (1000000L * less) / (n - 1) else 0L
      assert(r.getLong(3) == want,
        s"doc=${r.getLong(0)} src=${r.getString(1)}: " +
          s"pct=${r.getLong(3)} want=$want")
    }
  }

  test("ties share a percentile; percentiles span [0, 1e6]") {
    val rows = QuantileNorm.qualityQuantileNorm(spark, sf).collect()
    val byKey = rows.groupBy(r => (r.getString(1), r.getLong(2)))
    for ((_, g) <- byKey)
      assert(g.map(_.getLong(3)).distinct.length == 1)
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 1000000L))
    // every multi-doc source has a 0-percentile (its minimum-score doc)
    for ((_, g) <- rows.groupBy(_.getString(1)) if g.length > 1)
      assert(g.exists(_.getLong(3) == 0L))
  }

  test("calibrated band reads the integer percentile, never the double") {
    val rows = QuantileNorm.qualityQuantileNorm(spark, sf).collect()
    for (r <- rows) {
      val want =
        if (r.getLong(3) >= QuantileNorm.KeepE6) "keep_top"
        else if (r.getLong(3) >= QuantileNorm.MidE6) "mid"
        else "tail"
      assert(r.getString(4) == want)
    }
  }
}
