package graft.streaming

import graft.SparkTestSession
import graft.operators.EwmaAnomaly

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The ring-buffer streaming scorer must reproduce the batch lag-window
  * anomaly flags row-for-row across micro-batch seams — including a
  * seam INSIDE a user's chain, which exercises the carried state. */
class StreamEwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed flags equal the batch gate across uneven batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // feed in global (ts, event_id) order: per-user order preserved
    // (the Kafka key-partitioned contract), seams land mid-chain
    val evs = graft.Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "value")
      .as[StreamEwma.Ev].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val mem = MemoryStream[StreamEwma.Ev]
    val q = StreamEwma.flagsOverStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode(StreamEwma.outputMode).start()
    try {
      val third = evs.length / 3
      Seq(evs.take(third), evs.slice(third, third + 1),
        evs.drop(third + 1)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val key = (r: org.apache.spark.sql.Row) => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))
      val streamed = spark.table("ewma_stream").collect().map(key).toMap
      val batch = EwmaAnomaly.ewmaAnomaly(spark, sf)
        .collect().map(key).toMap
      assert(streamed.size == evs.length)
      assert(streamed == batch)
      assert(streamed.values.exists(_._5))
    } finally q.stop()
  }
}
