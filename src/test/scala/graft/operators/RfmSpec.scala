package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for RFM segmentation beyond the hash oracle: an exhaustive
  * driver-side replay of the quartile definition (the fixture is
  * customer-sized), tie-sharing, monotonicity, and the segment CASE. */
class RfmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = Rfm.rfmSegments(spark, sf)
    .collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))
    }

  /** Brute-force quartile index: floor(4 * |strictly smaller| / n). */
  private def bruteIdx(vs: Seq[Long]): Map[Long, Long] = {
    val n = vs.size.toLong
    vs.distinct.map(v => v -> 4 * vs.count(_ < v).toLong / n).toMap
  }

  test("rfm: scores replay the exact rank definition, ties share a score") {
    assert(rows.nonEmpty)
    val rIdx = bruteIdx(rows.map(_._2).toSeq)
    val fIdx = bruteIdx(rows.map(_._3).toSeq)
    val mIdx = bruteIdx(rows.map(r => r._4 / 100).toSeq)
    rows.foreach { case (ck, rec, freq, cents, rs, fs, ms, _) =>
      assert(rs == 4 - rIdx(rec), s"r_score cust $ck")
      assert(fs == fIdx(freq) + 1, s"f_score cust $ck")
      assert(ms == mIdx(cents / 100) + 1, s"m_score cust $ck")
    }
    // every score in 1..4 and each quartile class non-empty on f
    assert(rows.forall(r => r._5 >= 1 && r._5 <= 4
      && r._6 >= 1 && r._6 <= 4 && r._7 >= 1 && r._7 <= 4))
  }

  test("rfm: monotone — a larger metric never gets a smaller score") {
    val byF = rows.sortBy(_._3).map(_._6)
    assert(byF.zip(byF.tail).forall { case (a, b) => a <= b })
    val byM = rows.sortBy(_._4).map(_._7)
    assert(byM.zip(byM.tail).forall { case (a, b) => a <= b })
    // recency inverts: larger recency_days -> r_score not larger
    val byR = rows.sortBy(_._2).map(_._5)
    assert(byR.zip(byR.tail).forall { case (a, b) => a >= b })
  }

  test("rfm: segment labels replay the CASE and cover one row per customer") {
    val orders = graft.Tables(spark, sf, "orders")
    assert(rows.length == orders.select("o_custkey").distinct().count())
    rows.foreach { case (_, _, _, _, rs, fs, _, seg) =>
      val want =
        if (rs == 4 && fs == 4) "champion"
        else if (rs >= 3 && fs >= 3) "loyal"
        else if (rs >= 3) "recent"
        else if (fs >= 3) "at_risk"
        else if (rs == 1 && fs == 1) "hibernating"
        else "needs_attention"
      assert(seg == want)
    }
  }
}
