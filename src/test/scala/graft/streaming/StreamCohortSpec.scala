package graft.streaming

import graft.SparkTestSession
import graft.operators.Cohort

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The first-seen-state streaming twin must reproduce the batch retention
  * triangle's distinct-user counts from increments alone: each (user,
  * week) emits exactly once regardless of micro-batching or repeat
  * activity, under the per-user event-time ordering the Kafka key
  * partitioning provides. */
class StreamCohortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("summed increments equal the batch triangle across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // global event-time order implies per-user order (the T6 contract)
    val events = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().sortBy(_._2.getTime)
      .map { case (u, t) => StreamCohort.UserEvent(u, t) }

    // Equality below only holds while the fixture span fits the stream
    // twin's retention window (the batch triangle has NO cap): if a
    // regenerated corpus ever spans >= MaxOffsetWeeks weeks, fail HERE
    // with the reason, not in the opaque map comparison.
    val spanWeeks = (StreamCohort.weekStartDay(events.last.ts) -
      StreamCohort.weekStartDay(events.head.ts)) / 7
    assert(spanWeeks < StreamCohort.MaxOffsetWeeks,
      s"fixture spans $spanWeeks weeks >= MaxOffsetWeeks=" +
        s"${StreamCohort.MaxOffsetWeeks}: the capped stream twin cannot " +
        "equal the uncapped batch triangle on this corpus")

    val mem = MemoryStream[StreamCohort.UserEvent]
    val q = StreamCohort.incrementsOverStream(mem.toDS())
      .writeStream.format("memory").queryName("cohort_stream")
      .outputMode(StreamCohort.outputMode).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val inc = spark.table("cohort_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // exactly-once per (user, week)
      assert(inc.length == inc.distinct.length, "duplicate increments")
      val streamed = inc.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(_._3).distinct.size.toLong).toMap
      val batch = Cohort.cohortRetention(spark, sf).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("repeat activity within a week emits nothing new") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamCohort.UserEvent]
    val q = StreamCohort.incrementsOverStream(mem.toDS())
      .writeStream.format("memory").queryName("cohort_stream2")
      .outputMode(StreamCohort.outputMode).start()
    try {
      val t0 = Timestamp.valueOf("2026-01-07 10:00:00") // Wed of wk 2026-01-05
      mem.addData(StreamCohort.UserEvent(1L, t0)); q.processAllAvailable()
      mem.addData(StreamCohort.UserEvent(1L,
        Timestamp.valueOf("2026-01-09 10:00:00"))); q.processAllAvailable()
      mem.addData(StreamCohort.UserEvent(1L,
        Timestamp.valueOf("2026-01-13 10:00:00"))); q.processAllAvailable()
      val rows = spark.table("cohort_stream2").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq(("2026-01-05", 0L, 1L), ("2026-01-05", 1L, 1L)),
        s"rows: $rows")
    } finally q.stop()
  }
}
