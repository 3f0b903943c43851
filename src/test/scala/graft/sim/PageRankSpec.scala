package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank contract: the distributed iteration must equal a
  * straightforward in-memory reference on hand graphs (exact integer
  * equality — there is no tolerance to hide behind), plus the structural
  * properties that make the signal useful. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** In-memory reference of the same fixed-point update. */
  private def ref(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val n = nodes.size
    val base = 15L * PageRank.Scale / (100L * n)
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += r(s) / deg(s)
      r = nodes.map(id => id -> (base + 85L * contrib(id) / 100L)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    import spark.implicits._
    val nd = nodes.toDF("id")
    val ed = edges.toDF("src", "dst")
    PageRank.pagerankFp(nd, ed, nodes.size.toLong, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("2-cycle is an exact fixed point: both ranks stay Scale/2 forever") {
    val got = run(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), 5)
    assert(got == Map(1L -> PageRank.Scale / 2, 2L -> PageRank.Scale / 2))
  }

  test("distributed iteration equals the in-memory reference exactly on a mixed graph") {
    // star into 1, a 2-cycle, a dangling sink, an isolated node
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val edges = Seq(
      (2L, 1L), (3L, 1L), (4L, 1L),  // star: hubs accumulate
      (1L, 2L),                      // back edge
      (2L, 5L),                      // 2 fans out (deg 2)
      (4L, 5L))                      // 5 is a dangling sink
    (1 to 5).foreach { iters =>
      assert(run(nodes, edges, iters) == ref(nodes, edges, iters),
        s"iteration $iters")
    }
  }

  test("structure: hubs outrank leaves, isolated nodes sit at the floor, dangling mass evaporates") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 5L), (4L, 5L))
    val r = run(nodes, edges, 5)
    val base = 15L * PageRank.Scale / (100L * nodes.size)
    assert(r(1L) > r(3L) && r(1L) > r(6L), "hub must outrank leaves")
    assert(r(6L) == base, "isolated node gets exactly the base rank")
    assert(r(3L) == base, "no-in-edge node gets exactly the base rank")
    assert(r.values.sum < PageRank.Scale,
      "dangling + damping must strictly shrink total mass")
    assert(r.values.forall(_ >= base), "base rank is a floor")
  }

  test("gate query emits TopK rows with a strictly rank-then-id order") {
    val rows = PageRank.pagerankKnn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == PageRank.TopK)
    rows.sliding(2).foreach {
      case Array((id1, r1), (id2, r2)) =>
        assert(r1 > r2 || (r1 == r2 && id1 < id2), "output order")
      case _ => ()
    }
  }
}
