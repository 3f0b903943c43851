package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The two Hamilton-apportionment laws (exact-sum, quota ±1) plus a
  * driver replay of the largest-remainder assignment. */
class AllocationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows() = Allocation.splitAllocation(spark, sf).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  test("allocations sum exactly to the budget and satisfy quota ±1") {
    val rs = rows()
    assert(rs.map(_._6).sum == Allocation.Budget)
    val total = rs.map(_._2).sum
    for ((src, mass, _, _, _, alloc) <- rs) {
      val exactFloor = (Allocation.Budget * mass) / total
      assert(alloc == exactFloor || alloc == exactFloor + 1,
        s"$src violates quota: alloc=$alloc floor=$exactFloor")
    }
  }

  test("extra seats go to the largest remainders, ties by source") {
    val rs = rows()
    val leftover = Allocation.Budget - rs.map(_._3).sum
    val order = rs.sortBy { case (src, _, _, rem, _, _) => (-rem, src) }
    val wantExtra = order.take(leftover.toInt).map(_._1).toSet
    for ((src, _, _, _, extra, _) <- rs)
      assert((extra == 1L) == wantExtra.contains(src), src)
  }
}
