package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental-ingest rollup against the shared quantizer's
  * own assignment relation: populations conserve, growth is the exact
  * integer basis-point ratio, and the hot flag replays the integer
  * cross-multiplication. */
class IvfIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("per-cell populations conserve and growth/hot replay exactly") {
    val (asg, _) = Ivf.assignments(spark, sf)
    val want = asg.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell")))
      .groupBy(_._2).map { case (cell, xs) =>
        val nNew = xs.count(_._1 % IvfIncremental.BatchMod ==
          IvfIncremental.BatchRes).toLong
        cell -> (xs.length - nNew, nNew)
      }
    val total = want.values.map(v => v._1 + v._2).sum
    val got = IvfIncremental.ivfIncremental(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet == want.keySet)
    for (r <- got) {
      val (nb, nn) = want(r.getInt(0))
      assert(r.getLong(1) == nb && r.getLong(2) == nn)
      if (nb > 0) assert(r.getLong(3) == 10000L * nn / nb)
      else assert(r.isNullAt(3))
      assert(r.getBoolean(4) ==
        ((nb + nn) * Ivf.NLists > IvfIncremental.HotFactor * total))
    }
    assert(got.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    assert(got.exists(_.getLong(2) > 0), "arriving slice never landed")
  }

  test("the assignment side is a zero-shuffle literal projection") {
    // the rollup's only exchange keys the cells-bounded aggregation;
    // nothing repartitions corpus rows before it
    val plan = IvfIncremental.ivfIncremental(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }
}
