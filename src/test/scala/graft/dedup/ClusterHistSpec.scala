package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster census must agree with the cluster label relation it
  * rides (no drift from parts) and conserve both clusters and member
  * documents. */
class ClusterHistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("census equals the label-relation rollup and conserves totals") {
    val labels = ConnectedComponents.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val want = labels.distinct.groupBy(_._2)
      .map { case (sz, xs) => (sz, xs.length.toLong, sz * xs.length) }.toSet
    val got = ConnectedComponents.dedupClusterHist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // every clustered doc is counted exactly once across the census
    assert(got.toSeq.map(_._3).sum == labels.length)
    // near-dup clusters have at least two members by construction
    assert(got.forall(_._1 >= 2))
  }
}
