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

    // freeze the model exactly as the batch query trains it
    val tr = graft.Tables(spark, sf, "documents")
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w) - 1),
          |  i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"""
          .stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = tr.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = tr.groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = c2.join(c1, "w1")
      .orderBy(desc("c2"), asc("w1"), asc("w2")).limit(BigramLm.BigramK)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val t = tr.count()

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
