package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the entry/exit matrix over q16's session islands
  * plus the conservation laws (entries = exits = sessions; singles ≤
  * entries; session count agrees with the q16 gate). */
class SessionEntryExitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sessions(): Seq[(String, String, Int)] = {
    val ev = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      val sessions = Seq.newBuilder[Seq[(Long, Long, Long, String)]]
      var cur = Seq.empty[(Long, Long, Long, String)]
      for (e <- sorted) {
        if (cur.nonEmpty && e._2 - cur.last._2 > 1800L * 1000000L) {
          sessions += cur; cur = Seq.empty
        }
        cur :+= e
      }
      if (cur.nonEmpty) sessions += cur
      sessions.result().map(s => (s.head._4, s.last._4, s.length))
    }
  }

  test("matrix equals the driver session replay") {
    val ss = sessions()
    val types = graft.Tables(spark, sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0))
    val want = types.map { t =>
      (t, ss.count(_._1 == t).toLong, ss.count(_._2 == t).toLong,
        ss.count(s => s._1 == t && s._3 == 1).toLong)
    }.toSet
    val got = SessionEntryExit.sessionEntryExit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("conservation: entries = exits = q16 session count") {
    val rows = SessionEntryExit.sessionEntryExit(spark, sf).collect()
    val nSessions = RelationalQueries.q16Sessionize(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_sessions"))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == nSessions)
    assert(rows.map(_.getLong(2)).sum == nSessions)
    for (r <- rows) assert(r.getLong(3) <= r.getLong(1))
  }
}
