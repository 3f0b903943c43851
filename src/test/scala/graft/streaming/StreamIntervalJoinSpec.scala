package graft.streaming

import java.sql.Timestamp

import graft.{SparkTestSession, Tables}
import graft.operators.IntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stream-stream interval join must produce the same joined pairs as
  * the batch bucketed interval join on a closed input (streaming≡batch
  * parity — the same check EventSessions uses against q16). */
class StreamIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream-stream attribution join matches batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val events = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, Timestamp, String)].collect().toSeq

    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val purchases = pMem.toDF().toDF("purchase_id", "user_id", "ts")
    val clicks = cMem.toDF().toDF("c_event_id", "c_user_id", "c_ts")
    val joined = StreamIntervalJoin.attributionJoin(purchases, clicks)
      .select(col("purchase_id"), col("c_event_id"))
    val q = joined.writeStream.format("memory").queryName("stream_ij")
      .outputMode("append").start()
    try {
      pMem.addData(events.collect {
        case (id, uid, ts, "purchase") => (id, uid, ts) })
      cMem.addData(events.collect {
        case (id, uid, ts, "click") => (id, uid, ts) })
      q.processAllAvailable()
      val streaming = spark.table("stream_ij")
        .as[(Long, Long)].collect().toSet

      val H6 = 6L * 3600 * 1000000
      val p = Tables(spark, sf, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val c = Tables(spark, sf, "events")
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
          col("event_id").as("c_event_id"))
      val batch = IntervalJoin
        .intervalJoin(p, c, "user_id", "c_user_id", "ts", "c_ts", -H6, 0L)
        .select(col("purchase_id"), col("c_event_id"))
        .as[(Long, Long)].collect().toSet

      assert(streaming.nonEmpty, "closed input should produce matches")
      assert(streaming == batch)
    } finally q.stop()
  }

  test("clicks older than the watermark are dropped, not joined late") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamIntervalJoin.attributionJoin(
      pMem.toDF().toDF("purchase_id", "user_id", "ts"),
      cMem.toDF().toDF("c_event_id", "c_user_id", "c_ts"))
      .select(col("purchase_id"), col("c_event_id"))
    val q = joined.writeStream.format("memory").queryName("stream_ij_late")
      .outputMode("append").start()
    try {
      // in-window click joins while the watermark is still low
      pMem.addData((1L, 7L, ts("2024-05-01 10:00:00")))
      cMem.addData((100L, 7L, ts("2024-05-01 09:30:00")))
      q.processAllAvailable()
      assert(spark.table("stream_ij_late").count() == 1)

      // advance both sides ~10 days: watermark sweeps past May 1 state
      pMem.addData((2L, 8L, ts("2024-05-11 10:00:00")))
      cMem.addData((200L, 8L, ts("2024-05-11 09:00:00")))
      q.processAllAvailable()
      val afterAdvance = spark.table("stream_ij_late").count()

      // a click for the May 1 purchase, in its window but far below the
      // watermark: state for that purchase is gone and the late click is
      // dropped on arrival — no new pairs may appear
      cMem.addData((101L, 7L, ts("2024-05-01 09:45:00")))
      q.processAllAvailable()
      assert(spark.table("stream_ij_late").count() == afterAdvance,
        "late click must not join after the watermark passed")
    } finally q.stop()
  }
}
