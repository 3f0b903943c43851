package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation must assign every node the min id of its
  * component, across chains (worst case for per-hop propagation),
  * multiple components, and self-loops. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .connectedComponents(edges.toDF("src", "dst"), maxIter)
      .as[(Long, Long)].collect().toMap
  }

  test("two components resolve to their min ids") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 10-node chain converges to a single component") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.values.toSet == Set(0L))
    assert(labels.keySet == (0L to 9L).toSet)
  }

  test("chain labels propagate regardless of edge direction") {
    // edges written high→low: min label must still flow the other way
    val chain = (0L until 9L).map(i => (i + 1, i))
    assert(cc(chain).values.toSet == Set(0L))
  }

  test("self-loops and duplicate edges are harmless") {
    val labels = cc(Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)))
    assert(labels == Map(5L -> 5L, 6L -> 5L))
  }

  test("random graphs match a reference union-find") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(30)
      val edges = Seq.fill(1 + rnd.nextInt(2 * n)) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      // reference: plain union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        // component min = min node id sharing v's root, restricted to
        // nodes that appear in the edge list
        val root = find(v.toInt)
        v -> nodes.filter(u => find(u.toInt) == root).min
      }.toMap
      assert(cc(edges) == expected, s"trial $trial: edges $edges")
    }
  }

  test("maxIter bounds the rounds (unconverged chain stays partial)") {
    val chain = (0L until 15L).map(i => (i, i + 1))
    val labels = cc(chain, maxIter = 2)
    // reach doubles per round (neighbor-min and pointer-doubling both read
    // the PREVIOUS round's labels: max(r+1, 2r) = 2r): jump-start init
    // gives reach 1, so after 2 rounds reach is exactly 4 and node 15's
    // label is exactly 15 - 4 — the test fails both if maxIter leaks extra
    // rounds and if a change over-propagates within a round
    assert(labels(15L) == 11L)
  }

  test("dedup_by_source tiers sum to the corpus-level dedup_apply row") {
    val sf = "/root/testdata/sf0.001"
    val bySrc = ConnectedComponents.dedupBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val apply = ConnectedComponents.dedupApply(spark, sf).collect().head
    assert(bySrc.map(_._2).sum == apply.getLong(0), "n_docs mismatch")
    assert(bySrc.map(_._3).sum == apply.getLong(1), "exact tier mismatch")
    assert(bySrc.map(_._4).sum == apply.getLong(2), "near tier mismatch")
    assert(bySrc.nonEmpty && bySrc.map(_._1).distinct.length == bySrc.length)
  }
}
