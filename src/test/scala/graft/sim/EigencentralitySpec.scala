package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point eigencentrality: driver replay of the integer power
  * iteration on a hand graph (star + appendage), ranking sanity on the
  * real gate graph, and the isolated-node decay law. */
class EigencentralitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val Scale = PageRank.Scale

  /** Driver-side twin of [[Eigencentrality.eigenFp]]. */
  private def replay(n: Long, edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val ed = edges ++ edges.map { case (u, v) => (v, u) }
    var x = (0L until n).map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val c = ed.groupBy(_._2)
        .map { case (v, es) => v -> es.map(e => x(e._1)).sum }
      val q = math.max(c.values.sum / Scale, 1L)
      x = (0L until n).map(i => i -> c.getOrElse(i, 0L) / q).toMap
    }
    x
  }

  test("engine scores on a star-with-tail graph equal the replay") {
    import spark.implicits._
    // star center 0 with leaves 1..4, tail 4-5-6; node 7 isolated
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (4L, 5L), (5L, 6L))
    val nodes = (0L to 7L).toDF("id")
    val e = edges.toDF("u", "v")
    val got = Eigencentrality.eigenFp(nodes, e, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = replay(8, edges, Eigencentrality.Iterations)
    assert(got == want)
    // the star center outranks its leaves (the graph is bipartite, so
    // at finite even iteration counts the walk mass legitimately peaks
    // on the tail junction — only the center/leaf order is invariant);
    // the isolate decays to zero
    assert(Seq(1L, 2L, 3L).forall(l => got(0L) > got(l)))
    assert(got(7L) == 0L)
  }

  test("gate query returns TopK descending positive scores") {
    val rows = Eigencentrality.eigencentralityKnn(spark, sf).collect()
    assert(rows.length == Eigencentrality.TopK)
    val scores = rows.map(_.getLong(1))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.last > 0)
  }
}
