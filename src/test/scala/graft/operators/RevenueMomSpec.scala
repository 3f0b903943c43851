package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Month chain laws for the MoM revenue view: consecutive months link
  * (prev of month m equals m−1's revenue), the first month has no
  * prev, and deltas reconstruct the revenue series. */
class RevenueMomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("lag chain links and deltas reconstruct the series") {
    val rows = RevenueMom.revenueMom(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate,
        r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1.toEpochDay)
    assert(rows.length > 3)
    assert(rows.head._3.isEmpty && rows.head._4.isEmpty)
    for (w <- rows.sliding(2) if w.length == 2) {
      val (a, b) = (w(0), w(1))
      assert(b._3.contains(a._2), s"prev link at ${b._1}")
      assert(b._4.contains(BigDecimal(b._2 - a._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble),
        s"delta at ${b._1}")
    }
  }

  test("monthly totals sum to the corpus revenue") {
    val total = RevenueMom.revenueMom(spark, sf).collect()
      .map(r => BigDecimal(r.getDouble(1))).sum
    val direct = graft.Tables(spark, sf, "lineitem")
      .selectExpr("round(sum(l_extendedprice * (1 - l_discount)), 2) AS r")
      .collect()(0).getDouble(0)
    // per-month rounding vs global rounding: within a cent per month
    assert((total - BigDecimal(direct)).abs.toDouble <=
      0.01 * RevenueMom.revenueMom(spark, sf).count())
  }
}
