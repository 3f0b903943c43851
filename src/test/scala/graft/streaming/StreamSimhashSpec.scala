package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Replaying the corpus through the frozen-index simhash stream must
  * raise exactly the batch `dedup_simhash_hamming` pairs — same
  * canonical ids, same Hamming distance — regardless of micro-batching
  * (each member of a pair finds the other's signature in the index,
  * collapsing to one canonical alert). */
class StreamSimhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed alerts equal the batch dedup_simhash_hamming pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = graft.dedup.DedupQueries.dedupSimhashHamming(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture must contain Hamming pairs")

    val idx = StreamSimhash.buildIndex(spark, sf)
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamSimhash.matchesOverStream(
      mem.toDS().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("simhash_stream")
      .outputMode(StreamSimhash.outputMode).start()
    try {
      // three uneven micro-batches, one of a single document
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("simhash_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"stream minus batch: ${(streamed -- batch).take(5)}; " +
          s"batch minus stream: ${(batch -- streamed).take(5)}")
    } finally q.stop()
  }
}
