package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The threshold-sensitivity curve is a lossless regrouping of the
  * LSH-verified pair relation: bucket counts partition the pairs, the
  * top-down cumulative column is the "pairs removed at this threshold"
  * readout, and the e4 sums are exact integer re-encodings of the
  * rounded similarities. */
class ThresholdCurveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("buckets partition the verified pairs; cumulative is monotone") {
    val pairs = DedupQueries.dedupMinhashLsh(spark, sf)
    val curve = DedupQueries.dedupThresholdCurve(spark, sf)
      .orderBy("bucket").collect()
    val nPairs = pairs.count()
    assert(curve.map(_.getLong(2)).sum == nPairs, "buckets must partition")
    // threshold 0.5 ⇒ buckets 10..20; jaccard = 1.0 lands in bucket 20
    assert(curve.forall(r => r.getLong(0) >= 10 && r.getLong(0) <= 20))
    // cum_pairs is the suffix sum: at the LOWEST bucket it covers all
    // pairs, and it is non-increasing as the bucket (threshold) rises
    assert(curve.head.getLong(3) == nPairs)
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(3) >= hi.getLong(3), "cumulative must decrease")
    case _ => ()
    }
    // per-bucket mean true-similarity lies inside the bucket's range
    curve.foreach { r =>
      val mean = r.getLong(5).toDouble / r.getLong(2) / 10000.0
      assert(mean >= r.getLong(0) * 0.05 - 1e-9 &&
        mean < (r.getLong(0) + 1) * 0.05 + 1e-9)
    }
  }
}
