package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Replaying the corpus through the frozen-index streaming filter must
  * raise exactly the batch LSH pipeline's verified pairs — same
  * canonical ids, same estimate, same Jaccard — regardless of
  * micro-batching (each member of a pair finds the other in the
  * index, collapsing to one canonical alert). */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed alerts equal the batch dedup_minhash_lsh pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = graft.dedup.DedupQueries.dedupMinhashLsh(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty, "fixture must contain near-dup pairs")

    val idx = StreamNearDup.buildIndex(spark, sf)
    assert(idx.stopShingles.isEmpty,
      "fixture corpus has no boilerplate shingles above the df cap")

    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamNearDup.matchesOverStream(
      mem.toDS().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode(StreamNearDup.outputMode).start()
    try {
      // three uneven micro-batches, one of a single document
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
