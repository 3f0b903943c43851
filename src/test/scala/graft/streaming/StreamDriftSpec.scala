package graft.streaming

import graft.SparkTestSession
import graft.sim.EmbeddingDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the drift monitor: replay the embeddings through
  * the stateful accumulator in uneven micro-batches, finish the final
  * per-(label, half) sums with the shared [[StreamDrift.driftRow]]
  * arithmetic, and the rows must equal the batch gate query's output
  * exactly — integer sums are order-free, so micro-batching cannot
  * change them. */
class StreamDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed sums finish into the batch drift rows") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = EmbeddingDrift.embeddingDrift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet

    val events = StreamDrift.toEvents(
      graft.Tables(spark, sf, "embeddings"))
      .as[StreamDrift.VecEvent].collect()

    val mem = MemoryStream[StreamDrift.VecEvent]
    val q = StreamDrift.sumsOverStream(mem.toDS())
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode(StreamDrift.outputMode).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      // final update per key = the one with the largest count (n is
      // strictly monotone across updates of a key)
      val finals = spark.table("drift_stream").collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          StreamDrift.DriftSums(r.getSeq[Long](2).toArray,
            r.getLong(3), r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2.n)._2).toMap
      val streamed = finals.keys.map(_._1).toSeq.distinct.map { label =>
        StreamDrift.driftRow(label, finals((label, 0)), finals((label, 1)))
      }.toSet
      assert(streamed == batch,
        s"drift: stream-only=${streamed -- batch}, " +
          s"batch-only=${batch -- streamed}")
    } finally q.stop()
  }
}
