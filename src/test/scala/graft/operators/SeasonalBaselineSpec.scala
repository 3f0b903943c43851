package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the (type, hour-of-day) cell baselines and the
  * cross-multiplied anomaly test. */
class SeasonalBaselineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("flags equal the driver cell replay") {
    val ev = graft.Tables(spark, sf, "events")
      .selectExpr("event_id", "event_type", "CAST(hour(ts) AS LONG) AS hod",
        "CAST(round(value * 100, 0) AS LONG) AS vc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cells = ev.groupBy(e => (e._2, e._3)).map { case (k, xs) =>
      k -> (xs.map(_._4).sum, xs.length.toLong)
    }
    val want = ev.filter { case (_, t, h, vc) =>
      val (sum, n) = cells((t, h))
      math.abs(vc * n - sum) > (SeasonalBaseline.Mult - 1) * sum
    }.map { case (id, t, h, vc) =>
      val (sum, n) = cells((t, h)); (id, t, h, vc, sum, n)
    }.toSet
    val got = SeasonalBaseline.seasonalAnomaly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("every flagged value is beyond Mult x its cell mean") {
    for (r <- SeasonalBaseline.seasonalAnomaly(spark, sf).collect()) {
      val (vc, sum, n) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(math.abs(vc * n - sum) > (SeasonalBaseline.Mult - 1) * sum)
    }
  }
}
