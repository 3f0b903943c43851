package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the shuffled-arrival lateness histogram plus the
  * conservation and power-of-two bucket laws. */
class LatenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def hash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }

  test("bucket histogram equals the driver replay") {
    val ev = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS tms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val buckets = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      var hi = Long.MinValue
      xs.sortBy { case (_, id, _) => (hash(s"arr|$id"), id) }.map {
        case (_, _, t) =>
          hi = math.max(hi, t)
          val late = hi - t
          if (late <= 0) 0L
          else 1L << (64 - java.lang.Long.numberOfLeadingZeros(late))
      }
    }
    val want = buckets.groupBy(identity)
      .map { case (b, xs) => (b, xs.size.toLong) }.toSet
    val got = Lateness.latenessProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.size > 1, "replay must exercise real lateness buckets")
  }

  test("conservation and power-of-two bucket laws") {
    val rows = Lateness.latenessProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = graft.Tables(spark, sf, "events").count()
    assert(rows.map(_._2).sum == total)
    for ((b, _) <- rows)
      assert(b == 0L || java.lang.Long.bitCount(b) == 1, s"bucket $b")
  }
}
