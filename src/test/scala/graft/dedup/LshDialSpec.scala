package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The LSH sensitivity dial: with consecutive row grouping over the same
  * 16 permutations, coarser bands (more rows per band) are unions of
  * adjacent finer bands, so the candidate sets are strictly NESTED —
  * 16×1 ⊇ 8×2 ⊇ 4×4 ⊇ 2×8. That is the recall/cost trade of banding
  * proven as set inclusion, not a probability argument. */
class LshDialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("candidate sets are nested as rows-per-band grows") {
    val mh = DedupQueries.minhashSignatures(
      DedupQueries.prunedShingles(spark, sf)).localCheckpoint(true)
    val configs = Seq((16, 1), (8, 2), (4, 4), (2, 8))
    val cands = configs.map { case (b, r) =>
      (b, r) -> DedupQueries.candidatePairs(DedupQueries.bandsAt(mh, b, r))
        .cache()
    }
    try {
      cands.sliding(2).foreach {
        case Seq(((fb, fr), finer), ((cb, cr), coarser)) =>
          assert(coarser.except(finer).count() == 0,
            s"$cb×$cr produced a pair $fb×$fr missed — nesting broken")
      }
      val counts = cands.map { case (c, df) => c -> df.count() }
      counts.sliding(2).foreach { case Seq((c1, n1), (c2, n2)) =>
        assert(n2 <= n1, s"$c2 has $n2 candidates > $c1's $n1")
      }
      // NO strict head>last assert: whether the dial separates configs
      // is a property of the planted duplicate density, and a driver
      // testdata regen must not redden this spec without a code defect —
      // the nesting + monotonicity asserts above are the dial's CONTRACT.
    } finally cands.foreach(_._2.unpersist())
  }
}
