package graft.functions

import graft.functions.BottomK.{Buf, BottomKAgg}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The bottom-k sketch must give the same result no matter how the input
  * is split and merged — that property is what lets Spark run it as a
  * map-side partial aggregate. */
class BottomKSpec extends AnyFunSuite {

  private val agg = new BottomKAgg(5)

  private def fold(items: Seq[(Long, Long)]): Buf =
    items.foldLeft(agg.zero)(agg.reduce)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("merge is split-invariant (partial aggregation safe)") {
    val genItems = Gen.listOfN(40,
      for { h <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
            v <- Gen.chooseNum(0L, 10000L) } yield (h, v))
    for (seed <- 1L to 50L) {
      val items = sample(genItems, seed)
      val whole = agg.finish(fold(items))
      val cut = sample(Gen.chooseNum(0, items.length), seed * 31)
      val (a, b) = items.splitAt(cut)
      val merged = agg.finish(agg.merge(fold(a), fold(b)))
      assert(merged == whole, s"seed $seed split $cut")
      // and merging in the other order too
      assert(agg.finish(agg.merge(fold(b), fold(a))) == whole)
    }
  }

  test("finish returns at most k values, ordered by hash") {
    val items = (1L to 20L).map(i => (21L - i, i)) // hashes descending
    val out = agg.finish(fold(items))
    assert(out == Seq(20L, 19L, 18L, 17L, 16L)) // smallest 5 hashes
  }
}
