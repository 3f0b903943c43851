package graft.streaming

import graft.SparkTestSession
import graft.operators.Streaks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The O(1)-state streak monitor's LATEST snapshot per user must equal
  * the batch gap-and-islands gate over the same events, across uneven
  * micro-batches; snapshots must be per-user monotone in active days. */
class StreamStreaksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("latest streamed snapshot equals the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val events = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id")
      .orderBy("ts", "event_id") // T6: time-ordered arrival per user
      .as[StreamStreaks.Ev].collect()

    val mem = MemoryStream[StreamStreaks.Ev]
    val q = StreamStreaks.profilesOverStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("streaks_stream")
      .outputMode(StreamStreaks.outputMode).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(7)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val snaps = spark.table("streaks_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDate(4)))
      // latest snapshot per user = the one with max active_days
      val latest = snaps.groupBy(_._1).map { case (u, xs) =>
        u -> xs.maxBy(_._2)
      }
      val batch = Streaks.userStreaks(spark, sf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getDate(4)))).toMap
      assert(latest == batch)
      assert(latest.nonEmpty)
      // snapshots are emitted once per new active day
      for ((u, xs) <- snaps.groupBy(_._1))
        assert(xs.map(_._2).sorted.sameElements(1L to xs.length.toLong),
          s"user $u snapshot cadence")
    } finally q.stop()
  }
}
