package graft.streaming

import graft.SparkTestSession
import graft.multimodal.Multimodal

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming media decoder must emit EXACTLY the batch features —
  * decode is per-record through the same codec lifecycle, so uneven
  * micro-batches cannot change a single histogram bin. */
class StreamMediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def flat(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6), r.getSeq[Long](7).toVector)
    }.toSet

  test("streamed media features equal batch features across uneven micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val media = Multimodal.mediaFromDocuments(spark, sf)
    val batch = flat(StreamMedia.featuresOverStream(media))
    assert(batch.nonEmpty)
    // all three codecs must be exercised
    assert(Set("image", "audio", "video")
      .subsetOf(batch.map(_._2)))

    val records = media.collect()
    val mem = MemoryStream[Multimodal.MediaRecord]
    val q = StreamMedia.featuresOverStream(mem.toDS())
      .writeStream.format("memory").queryName("media_stream")
      .outputMode(StreamMedia.outputMode).start()
    try {
      val (b1, rest) = records.splitAt(records.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      assert(flat(spark.table("media_stream")) == batch)
    } finally q.stop()
  }

  test("streamed audio/video fingerprints equal the batch relations") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val media = Multimodal.mediaFromDocuments(spark, sf)
    def fps(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    val batchA = fps(Multimodal.audioFingerprints(media))
    val batchV = fps(Multimodal.videoFingerprints(media))
    assert(batchA.nonEmpty && batchV.nonEmpty)

    val records = media.collect()
    val memA = MemoryStream[Multimodal.MediaRecord]
    val memV = MemoryStream[Multimodal.MediaRecord]
    val qA = StreamMedia.audioFpOverStream(memA.toDS())
      .writeStream.format("memory").queryName("audio_fp_stream")
      .outputMode(StreamMedia.outputMode).start()
    val qV = StreamMedia.videoFpOverStream(memV.toDS())
      .writeStream.format("memory").queryName("video_fp_stream")
      .outputMode(StreamMedia.outputMode).start()
    try {
      val (b1, b2) = records.splitAt(records.length / 2)
      Seq(b1, b2).foreach { b =>
        memA.addData(b.toIndexedSeq); qA.processAllAvailable()
        memV.addData(b.toIndexedSeq); qV.processAllAvailable()
      }
      assert(fps(spark.table("audio_fp_stream")) == batchA)
      assert(fps(spark.table("video_fp_stream")) == batchV)
    } finally { qA.stop(); qV.stop() }
  }
}
