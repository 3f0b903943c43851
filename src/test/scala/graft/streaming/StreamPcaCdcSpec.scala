package graft.streaming

import graft.SparkTestSession
import graft.multimodal.{CdcChunks, Multimodal}
import graft.sim.EmbedPca
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the two round-7 frozen-kernel twins: PCA
  * projection (frozen matrix) and CDC chunking (per-record kernel).
  * Both are stateless projections, so equality is exact across any
  * micro-batch split. */
class StreamPcaCdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed PCA projections equal the batch gate rows exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val m = EmbedPca.model(spark, sf)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()

    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamPca.projectionsOverStream(
        mem.toDS().toDF("vec_id", "embedding"), m)
      .writeStream.format("memory").queryName("pca_stream")
      .outputMode(StreamPca.outputMode).start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("pca_stream").collect()
        .map(r => (0 until 9).map(r.get).toSeq).toSet
      val batch = EmbedPca.embedPca(spark, sf).collect()
        .map(r => (0 until 9).map(r.get).toSeq).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("streamed CDC chunk instances equal the batch relation exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf).collect()

    val mem = MemoryStream[Multimodal.MediaRecord]
    val q = StreamCdc.chunksOverStream(mem.toDS())
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode(StreamCdc.outputMode).start()
    try {
      val (b1, b2) = media.splitAt(media.length / 3)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("cdc_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val batch = media.iterator.flatMap(CdcChunks.chunkRecord)
        .map(c => (c.id, c.hash, c.len))
        .toSeq.groupBy(identity).view.mapValues(_.size).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }
}
