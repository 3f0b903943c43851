package graft.streaming

import graft.SparkTestSession
import graft.text.Retrieval

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-stats streaming BM25 scorer must reproduce the batch
  * scorer row-for-row on the same corpus, across uneven micro-batches —
  * the stateless-projection property that lets retrieval scoring run on
  * an unbounded ingest stream. */
class StreamBm25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed scores equal the batch scorer across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // a corpus smaller than TopK so the batch gate's limit doesn't bite
    // and the full retrieved sets are comparable
    val corpus = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(15).cache()
    val stats = Retrieval.trainStats(corpus)
    assert(stats.df.nonEmpty && stats.nDocs == 15)

    val batch = Retrieval.bm25(corpus)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

    val docs = corpus.as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamBm25.scoreOverStream(
      mem.toDS().toDF("doc_id", "text"), stats)
      .writeStream.format("memory").queryName("bm25_stream")
      .outputMode(StreamBm25.outputMode).start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("bm25_stream")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally { q.stop(); corpus.unpersist() }
  }

  test("docs with no query-term hit are not emitted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stats = Retrieval.CorpusStats(Map("dup" -> 1L), 2L, 10L)
    val mem = MemoryStream[(Long, String)]
    val q = StreamBm25.scoreOverStream(
      mem.toDS().toDF("doc_id", "text"), stats)
      .writeStream.format("memory").queryName("bm25_stream_miss")
      .outputMode(StreamBm25.outputMode).start()
    try {
      mem.addData((1L, "dup zz"), (2L, "zz yy"))
      q.processAllAvailable()
      val got = spark.table("bm25_stream_miss").select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(1L))
    } finally q.stop()
  }
}
