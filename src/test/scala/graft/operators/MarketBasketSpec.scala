package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for market-basket rules beyond the hash oracle: an
  * exhaustive driver-side replay of the pair counting (the sf0.001
  * basket set is small), the support floor, and the rule algebra. */
class MarketBasketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = MarketBasket.marketBasket(spark, sf)
    .collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9))
    }

  private lazy val baskets: Map[Long, Set[String]] = {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
      .join(Tables(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "p_brand").collect()
    li.groupBy(_.getLong(0)).map { case (ok, rs) =>
      ok -> rs.map(_.getString(1)).toSet
    }
  }

  test("market_basket: pair counts replay brute-force basket scan") {
    assert(rows.nonEmpty)
    val n = baskets.size.toLong
    val bruteCounts = baskets.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val itemCounts = baskets.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // the operator emits exactly the pairs meeting the relative floor
    val expected = bruteCounts.filter(_._2 * MarketBasket.SupportDen >= n)
    assert(rows.length == expected.size)
    rows.foreach { case (a, b, pc, ca, cb, no, _, _, _, _) =>
      assert(a < b, "pair not canonically ordered")
      assert(pc == bruteCounts((a, b)))
      assert(ca == itemCounts(a) && cb == itemCounts(b))
      assert(no == n)
    }
  }

  test("market_basket: rule algebra — bounds and exact ratios") {
    rows.foreach { case (_, _, pc, ca, cb, n, sup, cab, cba, lift) =>
      assert(pc <= math.min(ca, cb), "pair count exceeds an item count")
      assert(pc * MarketBasket.SupportDen >= n, "support floor violated")
      assert(cab > 0 && cab <= 1.0 && cba > 0 && cba <= 1.0)
      assert(sup == BigDecimal(pc.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(lift == BigDecimal((n * pc).toDouble / (ca * cb).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // lift must point both ways: lift > 1 iff conf_ab > P(b)
    val n = rows.head._6.toDouble
    rows.foreach { case (_, _, _, _, cb, _, _, cab, _, lift) =>
      assert((lift > 1.0) == (cab > cb / n) ||
        math.abs(lift - 1.0) < 1e-4) // rounding at the boundary
    }
  }
}
