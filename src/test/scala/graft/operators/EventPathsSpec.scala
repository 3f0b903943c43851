package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the event-path operators beyond the hash oracle:
  * transition-matrix stochasticity and conservation, and the SCD2
  * interval laws (per-user partition into contiguous half-open
  * intervals, exactly one current row). */
class EventPathsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("event_transitions: conservation and row-stochastic probabilities") {
    val r = EventTransitionsFixture.rows(spark, sf)
    assert(r.nonEmpty)
    // total transitions = events - users (each user chain has n-1 steps)
    val ev = Tables(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(r.map(_._3).sum == nEvents - nUsers)
    // per-from probabilities sum to ~1 (rounding at 6 decimals)
    r.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-4)
      // n_from is the same on every row of the group and equals the sum
      assert(rs.map(_._4).distinct.size == 1)
      assert(rs.map(_._3).sum == rs.head._4)
    }
  }

  test("scd2_build: contiguous half-open intervals, one current per user") {
    val r = EventPaths.scd2Build(spark, sf)
      .select("user_id", "version", "valid_from", "valid_to", "is_current")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2),
        if (x.isNullAt(3)) null else x.getTimestamp(3), x.getLong(4)))
    assert(r.length == Tables(spark, sf, "events").count())
    r.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // versions dense from 1
      assert(sorted.map(_._2).toSeq == (1L to rs.length).toSeq, s"user $u")
      // chain: valid_to == next valid_from; only the last row is open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"gap in user $u chain")
          assert(a._5 == 0L)
        case _ =>
      }
      assert(sorted.last._4 == null && sorted.last._5 == 1L)
      // half-open: valid_from <= valid_to (equal timestamps only via
      // the event_id tiebreak producing zero-width versions)
      sorted.filter(_._4 != null).foreach(x =>
        assert(!x._3.after(x._4), s"inverted interval for user $u"))
    }
  }
}

/** Shared collect for the transitions suite (kept tiny at sf0.001). */
private object EventTransitionsFixture {
  def rows(spark: org.apache.spark.sql.SparkSession, sf: String)
    : Array[(String, String, Long, Long, Double)] =
    EventPaths.eventTransitions(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    }
}
