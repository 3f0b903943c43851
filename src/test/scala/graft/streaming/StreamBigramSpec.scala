package graft.streaming

import graft.SparkTestSession
import graft.text.{BigramLm, TextQueries}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-model streaming bigram scorer must reproduce the batch
  * query row-for-row across uneven micro-batches — the stateless-
  * projection property the whole frozen-scorer family shares. */
class StreamBigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed scores equal the batch query across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // freeze the model through the SAME builder the batch query plans
    val (model, t) = BigramLm.trainModel(
      graft.Tables(spark, sf, "documents"), BigramLm.BigramK)
    assert(model.nonEmpty && t > 0)

    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamBigram.scoreOverStream(
      mem.toDS().toDF("doc_id", "text"), model, t)
      .writeStream.format("memory").queryName("bigram_stream")
      .outputMode(StreamBigram.outputMode).start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("bigram_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
      val batch = BigramLm.qualityBigramScore(spark, sf)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
