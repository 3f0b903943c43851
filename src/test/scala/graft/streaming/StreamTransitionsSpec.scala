package graft.streaming

import graft.SparkTestSession
import graft.operators.EventPaths

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The last-event-state streaming twin must reproduce the batch
  * transition matrix from steps alone, across arbitrary micro-batch
  * boundaries, under per-user event-time arrival order (T6). */
class StreamTransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("summed steps equal the batch matrix across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // global (ts, event_id) order implies per-user order (T6 contract)
    val events = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)].collect()
      .sortBy(e => (e._2.getTime, e._3))
      .map { case (u, t, id, ty) => StreamTransitions.Ev(u, t, id, ty) }

    val mem = MemoryStream[StreamTransitions.Ev]
    val q = StreamTransitions.stepsOverStream(mem.toDS())
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode(StreamTransitions.outputMode).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(1) // a 1-row batch exercises the seam
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("trans_stream").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val batch = EventPaths.eventTransitions(spark, sf).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // conservation: steps = events - users
      assert(streamed.values.sum ==
        events.length - events.map(_.user_id).distinct.length)
    } finally q.stop()
  }

  test("chains stitch across batch boundaries via the stored last event") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamTransitions.Ev]
    val q = StreamTransitions.stepsOverStream(mem.toDS())
      .writeStream.format("memory").queryName("trans_stream2")
      .outputMode(StreamTransitions.outputMode).start()
    try {
      def ev(id: Long, ty: String) = StreamTransitions.Ev(
        7L, Timestamp.valueOf(s"2026-01-01 10:00:0$id"), id, ty)
      mem.addData(ev(1, "view"), ev(2, "click")); q.processAllAvailable()
      mem.addData(ev(3, "purchase")); q.processAllAvailable()
      val rows = spark.table("trans_stream2").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(rows == Seq(("view", "click"), ("click", "purchase")))
    } finally q.stop()
  }
}
