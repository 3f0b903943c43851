package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Replays the truncated dyadic EWMA driver-side per user chain and
  * pins the engine's lag-window formulation against it. */
class EwmaAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def replay(): Map[Long, (Long, Long, Long, Boolean)] = {
    val evs = graft.Tables(spark, sf, "events")
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getDouble(3)))
    evs.groupBy(_._2).iterator.flatMap { case (_, chain) =>
      var recent = List.empty[Long] // most recent first
      chain.sortBy(e => (e._3, e._1)).map { e =>
        val vc = math.round(e._4 * 100)
        val num = recent.zipWithIndex
          .map { case (v, j) => v * EwmaAnomaly.weight(j + 1) }.sum
        val den = recent.indices.map(j => EwmaAnomaly.weight(j + 1)).sum
        val anom = recent.length >= EwmaAnomaly.MinHist &&
          math.abs(vc * den - num) > EwmaAnomaly.ThresholdCents * den
        recent = (vc :: recent).take(EwmaAnomaly.W)
        e._1 -> ((vc, num, den, anom))
      }
    }.toMap
  }

  test("lag-window num/den/flag equal the ring-buffer replay") {
    val want = replay()
    val got = EwmaAnomaly.ewmaAnomaly(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.keySet == want.keySet)
    assert(got == want)
    assert(got.values.exists(_._4), "no anomalies at the fixture SF")
    assert(!got.values.forall(_._4))
  }

  test("short histories are never flagged; den is the dyadic prefix sum") {
    val rows = EwmaAnomaly.ewmaAnomaly(spark, sf).collect()
    val full = (1 to EwmaAnomaly.W).map(EwmaAnomaly.weight).sum
    for (r <- rows) {
      val den = r.getLong(4)
      // den ∈ {0, 128, 128+64, …, 255}: a prefix of the weight series
      val prefixes = (0 to EwmaAnomaly.W)
        .map(m => (1 to m).map(EwmaAnomaly.weight).sum).toSet
      assert(prefixes.contains(den))
      if (den < (1 to EwmaAnomaly.MinHist).map(EwmaAnomaly.weight).sum)
        assert(!r.getBoolean(5))
      assert(den <= full)
    }
  }
}
