package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Replays the fixed-round k-core peeling brute-force driver-side from
  * the collected mutual-edge relation and pins the engine's semi-join
  * loop against it node-for-node. */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def brutePeel(
      nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Option[Int]] = {
    var active = nodes
    var peelRound = Map.empty[Long, Int]
    for (r <- 1 to KCore.Rounds) {
      val deg = edges.filter(e => active(e._1) && active(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.length }
      val out = active.filter(n => deg.getOrElse(n, 0) < KCore.K)
      peelRound ++= out.map(_ -> r)
      active --= out
    }
    nodes.iterator.map(n => n -> peelRound.get(n)).toMap
  }

  test("engine peeling equals the brute-force replay") {
    val edges = GraphStats.mutualEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = graft.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = brutePeel(nodes, edges)
    val got = KCore.kcoreDecomposition(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1).toInt))).toMap
    assert(got.keySet == nodes)
    assert(got == want)
  }

  test("core is non-empty, a later peel round exists, flags consistent") {
    val rows = KCore.kcoreDecomposition(spark, sf).collect()
    assert(rows.exists(_.isNullAt(1)), "empty core")
    assert(rows.exists(r => !r.isNullAt(1) && r.getLong(1) >= 2),
      "no multi-round cascade — K mistuned for the fixture")
    for (r <- rows)
      assert(r.getBoolean(2) == r.isNullAt(1))
  }

  test("tiers rollup conserves the node population") {
    val tiers = KCore.kcoreTiers(spark, sf).collect()
    val n = graft.Tables(spark, sf, "embeddings").count()
    assert(tiers.map(_.getLong(1)).sum == n)
    assert(tiers.map(_.getString(0)).distinct.length == tiers.length)
  }
}
