package graft.streaming

import graft.SparkTestSession
import graft.text.TextQueries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-model streaming DSIR scorer must reproduce the batch
  * query's output row-for-row regardless of micro-batching — the same
  * stateless-projection property as the frozen-LM scorer, extended to
  * the frozen acceptance threshold. */
class StreamDsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed weights and acceptance equal the batch query across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // freeze the bucket models exactly as the batch query trains them
    val toks = graft.Tables(spark, sf, "documents")
      .select(col("lang"), explode(TextQueries.words(col("text"))).as("tok"))
      .select(col("lang"),
        pmod(TextQueries.hex32(col("tok")),
          lit(TextQueries.DsirBuckets.toLong)).as("b"))
      .cache()
    val raw = toks.groupBy("b").count().as[(Long, Long)].collect().toMap
    val nR = raw.values.sum
    val tgt = toks.filter(col("lang") === TextQueries.DsirTargetLang)
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    val nT = tgt.values.sum
    toks.unpersist()
    def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val weights = raw.map { case (b, cr) =>
      b -> (bitLen(nR / cr) - bitLen(nT / tgt.getOrElse(b, 1L)))
    }.toSeq
    val oov = bitLen(nR) - bitLen(nT)

    // freeze the acceptance threshold from the batch output
    val batch = TextQueries.dsirWeights(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val tw = batch.values.map(_._2).sum
    val nd = batch.size.toLong

    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val mem = MemoryStream[(Long, String)]
    val q = StreamDsir.scoreOverStream(
      mem.toDS().toDF("doc_id", "text"), weights, oov, tw, nd)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode(StreamDsir.outputMode).start()
    try {
      // three uneven micro-batches, one containing a single document
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("dsir_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      assert(streamed.values.exists(_._3) && streamed.values.exists(!_._3))
    } finally q.stop()
  }
}
