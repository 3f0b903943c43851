package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash dedup contract: aHash bits from real decoded pixels,
  * and band-join recall (pigeonhole-complete for hamming ≤ 3). */
class MediaPhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("aHash of a hand image has exactly the predicted bits") {
    // 8×8 image: left half 0, right half 200 → global mean 100;
    // blocks bx<4 all-zero (bit 0), bx>=4 all-200 (bit 1)
    val img = MediaCodec.decodeImage(
      MediaCodec.encodeImage(8, 8, i => if (i % 8 < 4) 0 else 200))
    val (hi, lo) = MediaCodec.aHash(img)
    // bit b = by*8+bx set iff bx >= 4: per row pattern 11110000b from
    // bit 4..7 → each byte 0xF0
    assert(lo == 0xf0f0f0f0L && hi == 0xf0f0f0f0L)
  }

  test("flat image hashes to zero (no block above the global mean)") {
    val img = MediaCodec.decodeImage(MediaCodec.encodeImage(8, 8, _ => 77))
    assert(MediaCodec.aHash(img) == (0L, 0L))
  }

  test("identical pixels → hamming 0; small perturbation → small hamming") {
    val base: Int => Int = i => (i * 37 + 11) % 251
    val h1 = MediaCodec.aHash(
      MediaCodec.decodeImage(MediaCodec.encodeImage(16, 16, base)))
    val h2 = MediaCodec.aHash(
      MediaCodec.decodeImage(MediaCodec.encodeImage(16, 16, base)))
    assert(h1 == h2)
    // perturb a handful of pixels slightly — most block means unchanged
    val h3 = MediaCodec.aHash(MediaCodec.decodeImage(
      MediaCodec.encodeImage(16, 16,
        i => if (i < 5) (base(i) + 3) % 251 else base(i))))
    val ham = java.lang.Long.bitCount(h1._1 ^ h3._1) +
      java.lang.Long.bitCount(h1._2 ^ h3._2)
    assert(ham <= 6, s"perturbed hamming $ham")
  }

  test("band join finds every pair brute force finds at hamming <= 3") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val hashes = Multimodal.mediaPhash(spark, dir)
      .as[(Long, Long, Long)].collect()
    // brute force over all image pairs
    val brute = (for {
      (a, ahi, alo) <- hashes; (b, bhi, blo) <- hashes if a < b
      ham = java.lang.Long.bitCount(ahi ^ bhi) +
        java.lang.Long.bitCount(alo ^ blo)
      if ham <= Multimodal.MaxPhashHamming
    } yield (a, b, ham)).toSet
    val banded = Multimodal.mediaPhashPairs(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    // banded ⊆ brute always (same hamming filter)
    assert(banded.subsetOf(brute))
    // pigeonhole: ≤3 flipped bits cannot touch all 4 bands
    val mustFind = brute.filter(_._3 <= 3)
    assert(mustFind.subsetOf(banded),
      s"missed guaranteed pairs: ${mustFind -- banded}")
    // the prefix-crop render makes planted tail-edit dups pixel-identical
    // up to the last-4-byte stamp: the gate relation must be NON-EMPTY
    // (round-6 verdict: an empty relation certifies nothing) and must
    // contain a hamming-0 pair (shared-prefix dups with matching tails
    // or full-crop-identical pairs)
    assert(banded.nonEmpty, "phash-pair gate relation is empty at sf0.001")
    assert(banded.exists(_._3 == 0),
      "expected at least one exact-dup image pair from planted text dups")
  }
}
