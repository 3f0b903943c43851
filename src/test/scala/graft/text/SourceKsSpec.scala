package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the integer two-sample KS distance (inclusive CDFs
  * over the union score grid, e6 floor rescale, max abs diff) plus
  * domain laws. */
class SourceKsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def scores(): Map[String, Seq[Long]] =
    QuantileNorm.scored(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSeq }

  test("pairwise KS equals the driver replay") {
    val bySource = scores()
    val grid = bySource.values.flatten.toSeq.distinct.sorted
    def cdfE6(xs: Seq[Long]): Map[Long, Long] = {
      val n = xs.length.toLong
      grid.map(t => t -> (1000000L * xs.count(_ <= t)) / n).toMap
    }
    val cdfs = bySource.map { case (s, xs) => s -> (cdfE6(xs), xs.length.toLong) }
    val srcs = bySource.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      ((ca, na), (cb, nb)) = (cdfs(a), cdfs(b))
    } yield (a, b, na, nb, grid.map(t => math.abs(ca(t) - cb(t))).max)).toSet
    val got = SourceKs.sourceKs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("KS laws: bounded, ordered pairs, full pair coverage") {
    val rows = SourceKs.sourceKs(spark, sf).collect()
    val k = scores().size
    assert(rows.length == k * (k - 1) / 2)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1))
      val ks = r.getLong(4)
      assert(ks >= 0L && ks <= 1000000L)
    }
  }
}
