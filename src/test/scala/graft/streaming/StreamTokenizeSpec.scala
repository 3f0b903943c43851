package graft.streaming

import graft.SparkTestSession
import graft.text.{Bpe, WordPiece}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-pieces streaming tokenizer must account exactly: per-source
  * sums of the streamed per-document counts equal the batch gate's
  * weighted-vocabulary totals under the same pieces, across uneven
  * micro-batches — integer equality, no tolerance. */
class StreamTokenizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("per-source streamed token sums equal the batch fertility totals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val corpus = graft.Tables(spark, sf, "documents")
    val pieces = WordPiece.trainPieces(
      Bpe.symbolizeWeighted(corpus), WordPiece.KMerges)

    // batch totals under the SAME pieces (the gate query's vocab path)
    val batch = corpus
      .select(col("source"), explode(graft.text.TextQueries.words(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n_occ"))
      .withColumn("cnt", WordPiece.munchCount(pieces))
      .groupBy("source").agg(
        sum(col("n_occ")).cast("long").as("n_words"),
        sum(col("n_occ") * length(col("t"))).cast("long").as("chars"),
        sum(col("n_occ") * col("cnt")).cast("long").as("n_tokens"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val docs = corpus.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamTokenize.countsOverStream(
      mem.toDS().toDF("doc_id", "source", "text"), pieces)
      .writeStream.format("memory").queryName("tok_stream")
      .outputMode(StreamTokenize.outputMode).start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("tok_stream")
        .groupBy("source").agg(
          sum(col("n_words")).cast("long").as("n_words"),
          sum(col("chars")).cast("long").as("chars"),
          sum(col("n_tokens")).cast("long").as("n_tokens"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
