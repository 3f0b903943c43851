package graft.tools

import graft.SparkTestSession
import graft.text.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** The fertility dial: BPE token counts are non-increasing in the merge
  * budget (each extra merge can only join adjacent symbols), and the
  * budgets are prefix-consistent (greedy-sequential training), which is
  * what lets the sweep train once at the largest budget. */
class TokenizerSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bpe fertility is non-increasing in the merge budget") {
    val docs = graft.Tables(spark, sf, "documents")
    val merges = Bpe.trainMerges(Bpe.symbolizeWeighted(docs), 4).map(_._1)
    val ferts = Seq(0, 1, 2, 4).map(k =>
      TokenizerSweep.bpeFertility(docs, merges, k))
    assert(ferts.zip(ferts.tail).forall { case (a, b) => b <= a },
      s"not monotone: $ferts")
    assert(ferts.last < ferts.head) // the merges actually bite
  }

  test("training budgets are prefix-consistent") {
    val docs = graft.Tables(spark, sf, "documents")
    val m4 = Bpe.trainMerges(Bpe.symbolizeWeighted(docs), 4).map(_._1)
    val m2 = Bpe.trainMerges(Bpe.symbolizeWeighted(docs), 2).map(_._1)
    assert(m4.take(2) == m2)
  }
}
