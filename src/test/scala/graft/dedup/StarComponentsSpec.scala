package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The large-star/small-star alternation is the adversarial-diameter
  * scale path next to pointer doubling: these specs prove (a) it is
  * CORRECT (labels identical to the pointer-doubling implementation and
  * to the known answer) and (b) it meets the published O(log² n) round
  * bound on the exact graph shape that defeats one-hop propagation — a
  * diameter-10³ chain whose node labels are scrambled so label order
  * carries no information about chain position. */
class StarComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Chain 0–1–…–1000 with labels scrambled by the bijection
    * i ↦ (i·557) mod 1009 (1009 prime, so multiplication by a unit is
    * injective over the 1001 node positions). Diameter 1000. */
  private def scrambledChain = {
    import spark.implicits._
    val n = 1000
    def l(i: Int): Long = (i.toLong * 557) % 1009
    ((0 until n).map(i => (l(i), l(i + 1))), (0 to n).map(l).min)
  }

  test("star alternation labels a diameter-1000 chain in O(log² n) rounds") {
    import spark.implicits._
    val (edges, expectedMin) = scrambledChain
    val (labels, rounds) = ConnectedComponents.starComponentsWithRounds(
      edges.toDF("src", "dst"))
    val got = labels.collect()
    assert(got.length == 1001, s"expected 1001 labeled nodes, got ${got.length}")
    assert(got.forall(_.getLong(1) == expectedMin),
      "some node did not reach the component minimum")
    // Kiveris et al. prove O(log² n) alternation rounds on any graph;
    // for n=1001 that is ceil(log2 n)^2 = 100 — and the whole point is
    // rounds ≪ diameter, so also pin a 10× margin below it
    val logBound = math.pow(math.ceil(math.log(1001) / math.log(2)), 2)
    assert(rounds <= logBound, s"$rounds rounds exceeds log² bound $logBound")
    assert(rounds < 100, s"$rounds rounds is not ≪ the 1000 diameter")
    info(s"converged in $rounds alternation rounds (diameter 1000)")
  }

  test("star alternation agrees with pointer doubling on a mixed graph") {
    import spark.implicits._
    // chain segments + hash-derived cross edges: multiple components of
    // varying diameter, deterministic
    val edges = ((0 until 300).map(i => (i.toLong, i.toLong + 1)) ++
      (0 until 200).map { i =>
        val a = (i * 7919L) % 997 + 2000
        val b = (i * 104729L) % 997 + 2000
        (a, b)
      }).filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val star = ConnectedComponents.connectedComponentsStars(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pd = ConnectedComponents.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == pd, "label maps differ between the two implementations")
  }

  test("star alternation reproduces the gate's near-dup clusters") {
    val sf = "/root/testdata/sf0.001"
    val pairs = DedupQueries.dedupMinhashLsh(spark, sf)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val star = ConnectedComponents.connectedComponentsStars(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pd = ConnectedComponents.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == pd,
      "swapping the CC implementation would change dedup_clusters")
  }
}
