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

  test("maxIter bounds the rounds (unconverged chain stays partial)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val labels = cc(chain, maxIter = 2)
    // 2 rounds of neighbor-min + pointer doubling reach at most 3 hops,
    // so node 9 cannot yet have learned the chain-global min 0
    assert(labels(9L) >= 6L)
  }
}
