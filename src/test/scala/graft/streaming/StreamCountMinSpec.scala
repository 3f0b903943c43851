package graft.streaming

import graft.SparkTestSession
import graft.functions.CountMin

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CMS counter matrix must equal the batch matrix over the
  * same rows regardless of micro-batching — the pure-sum property that
  * lets the sketch stream as a plain aggregation with d·w bounded state. */
class StreamCountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming counters after all batches equal the batch counters") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def toks(src: String, ids: Seq[Int]) = ids.map(i => (src, s"w${i % 37}"))
    val b1 = toks("a", 0 until 300) ++ toks("b", 0 until 40)
    val b2 = toks("a", 150 until 500) ++ toks("b", 20 until 60)
    val b3 = toks("a", 0 until 50) // pure repeats

    val mem = MemoryStream[(String, String)]
    val q = StreamCountMin.countersOverStream(
      mem.toDS().toDF("source", "t"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(StreamCountMin.outputMode).start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      mem.addData(b3); q.processAllAvailable()

      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
          r.getLong(3)).toMap

      val batch = StreamCountMin.countersOverStream(
        (b1 ++ b2 ++ b3).toDF("source", "t"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
          r.getLong(3)).toMap

      assert(streamed == batch)
      // every source has at most Depth * Width live cells
      assert(streamed.keys.groupBy(_._1)
        .forall(_._2.size <= CountMin.Depth * CountMin.Width))

      // and a point estimate read from the streamed matrix dominates the
      // exact count (the CMS contract carried over to streaming state)
      val probe = "w5"
      val exact = (b1 ++ b2 ++ b3).count(t => t._1 == "a" && t._2 == probe)
      val h = Seq(probe).toDF("t").select(CountMin.tokenHash(col("t"))).as[Long].head()
      val est = (0 until CountMin.Depth).map { j =>
        val bkt = Seq(h).toDF("h")
          .select(CountMin.bucket(col("h"), j)).as[Long].head()
        streamed.getOrElse(("a", j, bkt), 0L)
      }.min
      assert(est >= exact)
    } finally q.stop()
  }
}
