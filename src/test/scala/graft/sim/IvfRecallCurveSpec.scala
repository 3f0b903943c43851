package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The measured recall/cost dial's laws: hits and scanned counts are
  * monotone in nprobe, the full probe recovers the exhaustive top-k
  * exactly, and the curve agrees with the long-standing recallSweep
  * probe it was promoted from. */
class IvfRecallCurveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("monotone dial; full probe is exhaustive") {
    val rows = Ivf.ivfRecallCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(Ivf.RecallNprobes.map(_.toLong)))
    val hits = rows.map(_._2)
    assert(hits.zip(hits.tail).forall { case (a, b) => b >= a })
    val scanned = rows.map(_._3)
    assert(scanned.zip(scanned.tail).forall { case (a, b) => b >= a })
    val full = rows.last
    assert(full._2 == Ivf.TopK.toLong)
    val n = graft.Tables(spark, sf, "embeddings").count()
    assert(full._3 == n - 1) // every vector but the query
  }

  test("curve agrees with the recallSweep probe") {
    val sweep = Ivf.recallSweep(spark, sf, Ivf.RecallNprobes)
      .map { case (np, recall, _) =>
        np.toLong -> math.round(recall * Ivf.TopK) }.toMap
    val rows = Ivf.ivfRecallCurve(spark, sf).collect()
    for (r <- rows)
      assert(r.getLong(1) == sweep(r.getLong(0)), s"nprobe ${r.getLong(0)}")
  }
}
