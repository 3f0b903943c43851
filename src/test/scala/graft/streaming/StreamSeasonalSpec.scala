package graft.streaming

import graft.SparkTestSession
import graft.operators.SeasonalBaseline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Frozen-cell streaming flags must equal the batch gate row-for-row
  * when the arrivals replay the corpus, across uneven micro-batches. */
class StreamSeasonalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed flags equal the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // localCheckpoint, NOT cache(): a cached plan would be substituted
    // into any LATER identical plan in the shared session (the streaming
    // plan-lock spec builds the same frozenCells) and silently change
    // its locked outline to an InMemoryRelation scan
    val cells = StreamSeasonal.frozenCells(spark, sf).localCheckpoint(true)
    val events = graft.Tables(spark, sf, "events")
      .selectExpr("event_id", "event_type", "ts", "value")
      .as[(Long, String, Timestamp, Double)].collect()

    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    val q = StreamSeasonal.flagsOverStream(
      mem.toDS().toDF("event_id", "event_type", "ts", "value"), cells)
      .writeStream.format("memory").queryName("seasonal_stream")
      .outputMode(StreamSeasonal.outputMode).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 4)
      val (b2, b3) = rest.splitAt(3)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0),
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      val streamed = spark.table("seasonal_stream").collect()
        .map(key).toSet
      val batch = SeasonalBaseline.seasonalAnomaly(spark, sf).collect()
        .map(key).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
