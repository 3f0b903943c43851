package graft.streaming

import graft.SparkTestSession
import graft.text.TextQueries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-LM streaming scorer must reproduce the batch query's
  * output row-for-row regardless of micro-batching — the stateless-
  * projection property that lets the perplexity filter run on an
  * unbounded crawl with zero aggregation state. */
class StreamLmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed scores equal the batch query across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // freeze the LM exactly as the batch query trains it
    val toks = graft.Tables(spark, sf, "documents")
      .select(explode(TextQueries.words(col("text"))).as("tok"))
    val counts = toks.groupBy("tok").count().as[(String, Long)].collect()
    val n = counts.map(_._2).sum
    val vocab = counts.sortBy { case (t, c) => (-c, t) }
      .take(TextQueries.LmVocabK).toSeq

    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val mem = MemoryStream[(Long, String)]
    val q = StreamLmScore.scoreOverStream(
      mem.toDS().toDF("doc_id", "text"), vocab, n)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode(StreamLmScore.outputMode).start()
    try {
      // three uneven micro-batches, one containing a single document
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("lm_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
      val batch = TextQueries.qualityLmScore(spark, sf)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
