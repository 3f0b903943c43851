package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import graft.operators.RelationalQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the native session_window aggregation: finalized
  * session rows emitted by the watermarked streaming query must equal
  * the batch gate query's rows (q24's sessionWindowAgg) over the same
  * closed input — INCLUDING the exactly-gap boundary (exactly 30 min
  * after the predecessor extends the session; 30 min + 1 s splits it),
  * the bug class round 4 found in the q24 oracle. */
class StreamSessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val t0 = Timestamp.valueOf("2024-04-26 10:00:00").getTime
  private def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

  // the closed input: user 1 has the EXACTLY-gap pair (one session),
  // user 2 the gap+1s pair (two sessions), user 3 a three-event chain
  // spanning micro-batches, user 4 a singleton. Values are exact
  // binary fractions so stream/batch summation order cannot differ.
  private val batch1 = Seq(
    (1L, ts(0), 0.25), (1L, ts(1800), 0.5),        // exactly-gap: merges
    (2L, ts(0), 1.0), (3L, ts(0), 0.75), (4L, ts(60), 2.0))
  private val batch2 = Seq(
    (2L, ts(1801), 0.25),                          // gap+1s: new session
    (3L, ts(1500), 0.5), (3L, ts(3200), 0.25))     // extends across batches
  // sentinel far in the future: pushes the watermark past every real
  // session end so Append mode finalizes them; excluded from comparison
  private val pusher = Seq((99L, ts(86400 * 2), 0.0))

  test("streaming session_window rows equal the batch q24 aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamSessionWindows.sessions(
      mem.toDS().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("session_stream")
      .outputMode(StreamSessionWindows.outputMode).start()
    val streamed = try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
      mem.addData(pusher); q.processAllAvailable()
      // one more empty-advance so the state store drains everything the
      // pusher's watermark unlocked
      mem.addData(pusher); q.processAllAvailable()
      spark.table("session_stream").filter(col("user_id") =!= 99L)
        .collect().toSet
    } finally q.stop()

    val batchRows = RelationalQueries.sessionWindowAgg(
      (batch1 ++ batch2).toDF("user_id", "ts", "value")).collect().toSet
    assert(streamed == batchRows,
      s"stream/batch drift:\n stream=$streamed\n batch=$batchRows")

    // and the boundary semantics explicitly: user 1 merged, user 2 split
    def sessionsOf(u: Long) =
      batchRows.filter(_.getLong(0) == u).map(r => (r.getString(1), r.getLong(3)))
    assert(sessionsOf(1L) == Set(("2024-04-26 10:00:00", 2L)),
      "exactly-gap event must EXTEND the session")
    assert(sessionsOf(2L).size == 2, "gap+1s must open a new session")
    assert(streamed.exists(r => r.getLong(0) == 3L && r.getLong(3) == 3L),
      "cross-batch session must merge into one three-event row")
  }

  test("sessions finalize only after the watermark passes their end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamSessionWindows.sessions(
      mem.toDS().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("session_wm")
      .outputMode(StreamSessionWindows.outputMode).start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      // watermark has only seen batch1's max ts: nothing can finalize
      assert(spark.table("session_wm").isEmpty,
        "append-mode session emitted before its window could close")
      mem.addData(pusher); q.processAllAvailable()
      mem.addData(pusher); q.processAllAvailable()
      assert(spark.table("session_wm").filter(col("user_id") =!= 99L)
        .count() > 0, "watermark advance did not finalize sessions")
    } finally q.stop()
  }
}
