package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The collapse-first phash pair plan must emit EXACTLY the direct
  * plan's relation. Checked on a hand-built hash corpus with known
  * structure (fixture-independent — testdata regeneration cannot move
  * this spec) AND on the real sf0.01 pipeline output. */
class MediaPhashGroupedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.get(2).asInstanceOf[Number].longValue)).toSet

  // hand corpus: a 3-image exact-dup group, a hamming-2 neighbor of it
  // (shares 3 of 4 bands), a hamming-10 relative (band-matched candidate
  // but over budget vs EVERY other hash: 10 vs base, 8 vs the neighbor),
  // and an isolated far hash matching no band.
  private lazy val hand = {
    import spark.implicits._
    val base = 0x0f0f0f0f0f0f0f0fL
    val ham2 = base ^ 0x3L                 // 2 bits flipped in band 0
    val ham10 = base ^ 0x3ffL              // 10 bits flipped in band 0
    val far = 0x123456789abcdef0L
    Seq(
      (1L, base), (2L, base), (3L, base),  // exact-dup group
      (4L, ham2), (5L, ham10), (6L, far))
      .map { case (id, h) => (id, h >>> 32, h & 0xffffffffL) }
      .toDF("id", "hash_hi", "hash_lo")
  }

  test("hand corpus: grouped twin equals the direct plan, with the exact expected relation") {
    val direct = pairs(Multimodal.phashPairs(hand))
    val grouped = pairs(Multimodal.phashPairsGrouped(hand))
    assert(grouped == direct)
    // C(3,2) zero pairs + each group member paired with the hamming-2
    // neighbor; the hamming-10 relative is band-matched but over budget,
    // the far hash matches no band
    val expect = Set(
      (1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L),
      (1L, 4L, 2L), (2L, 4L, 2L), (3L, 4L, 2L))
    assert(direct == expect)
  }

  test("sf0.01 pipeline: grouped twin equals the direct plan pair-for-pair") {
    val sf = "/root/testdata/sf0.01"
    val direct = pairs(Multimodal.mediaPhashPairs(spark, sf))
    val grouped = pairs(Multimodal.mediaPhashPairsGrouped(spark, sf))
    assert(direct.nonEmpty,
      "gate relation must be non-empty for this equality to certify anything")
    assert(grouped == direct)
  }

  test("intra-group expansion is complete on the hand corpus: n·(n−1)/2 zero pairs per group") {
    val gotZero = pairs(Multimodal.phashPairsGrouped(hand)).count(_._3 == 0L)
    assert(gotZero == 3) // one group of 3 → C(3,2)
  }
}
