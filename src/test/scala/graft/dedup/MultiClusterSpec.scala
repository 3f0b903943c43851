package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_clusters_multi` — the ensemble clustering must ABSORB every
  * single-signal pair relation: any pair linked by LSH, simhash-Hamming
  * or containment lands in the same multi-cluster, the membership is
  * exactly the union's vertex set, and the ensemble is at least as
  * coarse as the LSH-only clustering (a cluster can merge, never
  * split). */
class MultiClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val labels =
    ConnectedComponents.dedupClustersMulti(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("every single-signal pair is intra-cluster; membership is the union") {
    val all = pairs(DedupQueries.dedupMinhashLsh(spark, sf)) ++
      pairs(DedupQueries.dedupSimhashHamming(spark, sf)) ++
      pairs(PrefixJoin.dedupContainmentIndexed(spark, sf))
    assert(all.nonEmpty)
    all.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b),
        s"pair ($a, $b) missing from the ensemble membership")
      assert(labels(a) == labels(b),
        s"pair ($a, $b) split across ensemble clusters")
    }
    assert(labels.keySet == all.flatMap(p => Seq(p._1, p._2)).toSet,
      "ensemble membership is not exactly the union's vertex set")
  }

  test("ensemble is at least as coarse as the LSH-only clustering") {
    val lshOnly = ConnectedComponents.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same LSH cluster => same multi cluster (merging allowed, splitting
    // is a CC bug)
    lshOnly.groupBy(_._2).values.foreach { members =>
      val multi = members.keys.map(labels(_)).toSet
      assert(multi.size == 1,
        s"LSH cluster ${members.head._2} split in the ensemble")
    }
    // and the fixture actually exercises a MERGE or an extra signal —
    // otherwise the ensemble is vacuously the LSH clustering
    assert(labels.size > lshOnly.size,
      "no additional signal contributed on the fixture corpus")
  }
}
