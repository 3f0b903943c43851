package graft.dedup

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Soft-dedup weight invariants: the per-source micro-mass must equal
  * the hand-recomputed sum over the cluster relation, every cluster's
  * total mass must collapse to ≈1 (exactly 1e6 − (1e6 mod k) micro),
  * and singletons must keep full weight. */
class SampleWeightsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-source mass equals the recomputation from cluster labels") {
    val got = ConnectedComponents.dedupSampleWeights(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val labels = ConnectedComponents.dedupClusters(spark, dir)
      .select("doc_id", "cluster_size")
    val expected = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(labels, Seq("doc_id"), "left")
      .collect().groupBy(_.getString(1)).map { case (src, rows) =>
        val mass = rows.map { r =>
          val k = if (r.isNullAt(2)) 1L else r.getLong(2)
          1000000L / k
        }.sum
        src -> ((rows.length.toLong, mass,
          rows.length * 1000000L - mass))
      }
    assert(got == expected)
    // the discount is real at sf0.001 (clusters exist)
    assert(got.values.map(_._3).sum > 0, "no cluster ever discounted")
  }

  test("every cluster's total mass collapses to one doc's worth") {
    val labels = ConnectedComponents.dedupClusters(spark, dir)
    val perCluster = labels.groupBy("cluster_id", "cluster_size")
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      val k = r.getLong(1)
      assert(r.getLong(2) == k, "cluster_size must equal member count")
      val mass = k * (1000000L / k)
      assert(mass <= 1000000L && mass > 1000000L - k,
        s"cluster of $k mass $mass out of the floor-loss envelope")
    }
  }
}
