package graft.streaming

import graft.SparkTestSession
import graft.text.QualityClassifier

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-probe streaming scorer must reproduce the batch classifier
  * row-for-row regardless of micro-batching — the stateless-projection
  * property that lets the model-based quality filter run on an unbounded
  * crawl with zero aggregation state. */
class StreamClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed scores equal the batch query across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val w = QualityClassifier.weights(spark, sf)
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val mem = MemoryStream[(Long, String)]
    val q = StreamClassifier.scoreOverStream(
      mem.toDS().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode(StreamClassifier.outputMode).start()
    try {
      // three uneven micro-batches, one containing a single document
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val key = (r: org.apache.spark.sql.Row) => r.getLong(0) ->
        (r.getBoolean(1), r.getDouble(2), r.getBoolean(3))
      val streamed = spark.table("clf_stream").collect().map(key).toMap
      val batch = QualityClassifier.qualityClassifier(spark, sf)
        .collect().map(key).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
