package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Neighborhood-function semantics on hand graphs (exact ball counts
  * per radius), ANF estimator accuracy against the exact twin, and the
  * fixture-gate invariants (monotone, saturating, flag green). */
class NeighborhoodSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def graph(edges: (Long, Long)*) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .toDF("id")
    val bid = edges.toDF("a", "b")
      .unionByName(edges.map(_.swap).toDF("a", "b"))
    (nodes, bid)
  }

  test("path graph: hand-computed ball sizes per radius") {
    // 1-2-3-4-5: |B(v,1)| = 2,3,3,3,2 → 13; t=2 → 19; t=3 → 23
    val (nodes, bid) = graph((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r = Neighborhood.exactOver(nodes, bid)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 13L, 2L -> 19L, 3L -> 23L))
  }

  test("disconnected components never mix") {
    val (nodes, bid) = graph((1L, 2L), (10L, 11L), (11L, 12L))
    val r = Neighborhood.exactOver(nodes, bid)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // t=1: {1,2}: 4 pairs; {10,11,12} path: 3+... 2+3+2=7+wait
    // {1,2}: each ball 2 → 4. {10,11,12}: 2+3+2 = 7. total 11
    assert(r(1L) == 11L)
    // saturated at t=2: {1,2} 4; path-3 fully connected balls 3 → 9+4=13
    assert(r(2L) == 13L && r(3L) == 13L)
  }

  test("ANF estimate tracks exact within the gate bound on a 60-clique-chain") {
    // 3 cliques of 20 joined by bridges — balls big enough that the
    // estimator does real work (not just tiny-count luck)
    val cliques = for {
      c <- 0 until 3; i <- 0 until 20; j <- (i + 1) until 20
    } yield (c * 100L + i, c * 100L + j)
    val bridges = Seq((19L, 100L), (119L, 200L))
    val (nodes, bid) = graph(cliques ++ bridges: _*)
    val r = Neighborhood.anfOver(nodes, bid).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r.foreach { case (t, exact, estMicro) =>
      val rel = math.abs(estMicro / 1e6 - exact) / exact
      assert(rel <= Neighborhood.AnfBound,
        s"t=$t exact=$exact est=${estMicro / 1e6} rel=$rel")
    }
    // balls really grow across the bridge rounds
    assert(r(0)._2 < r(1)._2 && r(1)._2 < r(2)._2)
  }

  test("fixture gate: monotone non-decreasing, ANF flag green") {
    val dir = "/root/testdata/sf0.001"
    val ex = Neighborhood.graphNeighborhood(spark, dir)
      .orderBy("radius").collect().map(_.getLong(1))
    assert(ex.sameElements(ex.sorted), "N(t) must be non-decreasing")
    val flags = Neighborhood.graphNeighborhoodAnf(spark, dir)
      .collect().map(_.getBoolean(2))
    assert(flags.forall(identity))
  }
}
