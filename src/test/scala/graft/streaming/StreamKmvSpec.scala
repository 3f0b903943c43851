package graft.streaming

import graft.SparkTestSession
import graft.functions.Kmv
import graft.text.TextQueries.hex32
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming KMV sketch must equal the batch sketch over the same
  * rows, regardless of how the stream is micro-batched — the
  * order-insensitivity that makes an O(k)-state running cardinality
  * estimate sound. */
class StreamKmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming sketch after all batches equals the batch sketch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // two keys, overlapping values, duplicates across micro-batches
    def ev(key: String, ids: Range) =
      ids.map(i => (key, s"v$i")).toDF("key", "v")
        .select(col("key"), hex32(col("v")).as("h"))
        .as[StreamKmv.HashEvent].collect().toSeq

    val b1 = ev("a", 0 until 400) ++ ev("b", 0 until 30)
    val b2 = ev("a", 200 until 600) ++ ev("b", 10 until 40) // overlaps b1
    val b3 = ev("a", 0 until 100) // pure duplicates

    val mem = MemoryStream[StreamKmv.HashEvent]
    val q = StreamKmv.distinctOverStream(mem.toDS())
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(StreamKmv.outputMode).start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      mem.addData(b3); q.processAllAvailable()

      // final update per key: both n_kept and the estimate are monotone
      // non-decreasing across updates (the sketch only absorbs values and
      // its k-th smallest hash only shrinks), so max = last
      val streamed = spark.table("kmv_stream")
        .groupBy("key").agg(max("n_kept").as("n_kept"),
          max("est_distinct").as("est"))
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2)))
        .toMap

      // batch twin over the union of all batches
      val agg = new Kmv.KmvAgg(Kmv.K)
      val batch = (b1 ++ b2 ++ b3).groupBy(_.key).map { case (k, evs) =>
        val buf = evs.foldLeft(agg.zero)((b, e) => agg.reduce(b, e.h))
        k -> (buf.items.size, StreamKmv.estimate(buf))
      }

      assert(streamed == batch)
      // key "a" saw 600 distinct values > K: estimator path exercised
      assert(streamed("a")._1 == Kmv.K)
      // key "b" saw 40 distinct < K: exact path
      assert(streamed("b") == ((40, 40.0)))
    } finally q.stop()
  }
}
