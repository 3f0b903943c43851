package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

/** The pigeonhole law the Manku block index rests on, checked over the
  * actual block decomposition `dedup_simhash_hamming` ships (4 × 8-bit
  * blocks of a 32-bit value): ANY pair at Hamming distance ≤ 3 agrees
  * exactly on at least one block — no candidate is ever lost — and the
  * converse direction (block agreement without closeness) exists, which
  * is why the popcount verify is load-bearing. The ≤3-flip space is
  * checked EXHAUSTIVELY for a seeded sample of base values (all C(32,1)
  * + C(32,2) + C(32,3) = 5,488 flip sets per base). */
class SimhashBlockPropertySpec extends AnyFunSuite {

  private def blocks(v: Long): Seq[Long] =
    (0 until 4).map(j => (v >> (8 * j)) & 0xffL)

  private def agreeSomewhere(x: Long, y: Long): Boolean =
    blocks(x).zip(blocks(y)).exists { case (a, b) => a == b }

  test("no pair within Hamming 3 ever escapes the block index") {
    val rnd = new scala.util.Random(0x5eed)
    val bases = Seq(0L, 0xffffffffL, 0x0f0f0f0fL, 0x80000001L) ++
      Seq.fill(16)(rnd.nextLong() & 0xffffffffL)
    val flipSets =
      (0 until 32).map(Seq(_)) ++
        (for (a <- 0 until 32; b <- a + 1 until 32) yield Seq(a, b)) ++
        (for (a <- 0 until 32; b <- a + 1 until 32; c <- b + 1 until 32)
          yield Seq(a, b, c))
    assert(flipSets.size == 32 + 496 + 4960)
    for (x <- bases; flips <- flipSets) {
      val y = flips.foldLeft(x)((v, bit) => v ^ (1L << bit))
      assert(agreeSomewhere(x, y),
        s"pair at distance ${flips.size} with NO agreeing block: x=$x y=$y")
    }
  }

  test("4 flips CAN escape every block — K=3 is tight, not conservative") {
    // one flip in each block: no block agrees, distance 4
    val x = 0L
    val y = (1L << 0) | (1L << 8) | (1L << 16) | (1L << 24)
    assert(java.lang.Long.bitCount(x ^ y) == 4)
    assert(!agreeSomewhere(x, y))
  }

  test("block agreement does not imply closeness — verify is load-bearing") {
    // agree on block 0, differ everywhere else: distance 24
    val x = 0L
    val y = 0xffffff00L
    assert(blocks(x).head == blocks(y).head)
    assert(java.lang.Long.bitCount(x ^ y) > DedupQueries.SimhashHammingK)
  }
}
