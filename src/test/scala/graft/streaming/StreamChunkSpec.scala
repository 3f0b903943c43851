package graft.streaming

import graft.SparkTestSession
import graft.text.Chunking

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming chunker must emit EXACTLY the batch gate's rows —
  * chunking is a per-document projection, so micro-batch boundaries
  * (even mid-corpus, uneven splits) can never change a chunk. */
class StreamChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed chunks equal batch chunks row-for-row across uneven micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = Chunking.chunk(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet

    val rows = docs.as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamChunk.chunksOverStream(mem.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode(StreamChunk.outputMode).start()
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("chunk_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
