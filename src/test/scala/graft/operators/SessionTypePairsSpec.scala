package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the within-session co-occurrence matrix over the
  * shared q16 session islands, plus the basket algebra (n_both ≤
  * min(n_a, n_b); full C(5,2) coverage on this corpus). */
class SessionTypePairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sessionSets(): Seq[Set[String]] = {
    val ev = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      val out = Seq.newBuilder[Set[String]]
      var cur = Set.empty[String]
      var lastUs = Long.MinValue
      for (e <- sorted) {
        if (lastUs != Long.MinValue && e._2 - lastUs > 1800L * 1000000L) {
          out += cur; cur = Set.empty
        }
        cur += e._4; lastUs = e._2
      }
      if (cur.nonEmpty) out += cur
      out.result()
    }
  }

  test("matrix equals the driver session-set replay") {
    val ss = sessionSets()
    val types = ss.flatten.distinct.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
      (a, b) = (types(i), types(j))
      both = ss.count(s => s(a) && s(b)).toLong if both > 0
    } yield (a, b, ss.count(_(a)).toLong, ss.count(_(b)).toLong, both,
      BigDecimal(both.toDouble / ss.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = SessionTypePairs.sessionTypePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("basket algebra: n_both bounded by both singles") {
    for (r <- SessionTypePairs.sessionTypePairs(spark, sf).collect())
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
  }
}
