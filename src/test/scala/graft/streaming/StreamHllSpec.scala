package graft.streaming

import graft.SparkTestSession
import graft.functions.Hll
import graft.text.TextQueries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming HLL estimate after consuming the whole stream must
  * equal the batch estimate over the same rows (register merge is
  * batching-independent), and the exact distinct twin must be rejected
  * on streams — the property that makes the sketch THE streaming plan,
  * not an approximation of one. */
class StreamHllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed estimate equals the batch estimate over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()

    val mem = MemoryStream[(String, String)]
    val q = StreamHll.distinctOverStream(
      mem.toDS().toDF("source", "text"), Hll.Rsd)
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(StreamHll.outputMode).start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("hll_stream")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      val batch = TextQueries.sourceTrigrams(graft.Tables(spark, sf, "documents"))
        .groupBy("source")
        .agg(approx_count_distinct(col("sg"), Hll.Rsd).as("n_hll"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("the exact distinct twin is rejected on streams") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, String)]
    val agg = mem.toDS().toDF("source", "text")
      .groupBy("source").agg(countDistinct(col("text")).as("n"))
    val e = intercept[Exception] {
      val q = agg.writeStream.format("memory")
        .queryName("hll_exact_reject")
        .outputMode(StreamHll.outputMode).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.toLowerCase.contains("distinct"))
  }
}
