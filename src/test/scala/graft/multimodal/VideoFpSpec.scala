package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.videoFingerprints]] — the frame-sequence digest on
  * hand-built clips: identical clips share a fingerprint, frame ORDER
  * is part of the identity (same frames reordered must differ — the
  * property a bag-of-frames hash would lose), and a single-pixel change
  * in one frame changes it. */
class VideoFpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def frame(level: Int): Array[Byte] =
    MediaCodec.encodeImage(Multimodal.VideoFrameEdge,
      Multimodal.VideoFrameEdge, _ => (100 + level).toByte)

  private def clip(id: Long, levels: Seq[Int]): Multimodal.MediaRecord =
    Multimodal.MediaRecord(id, "video",
      MediaCodec.encodeVideo(1000, levels.map(frame)))

  private def fpOf(recs: Seq[Multimodal.MediaRecord]): Map[Long, (Long, String)] = {
    import spark.implicits._
    Multimodal.videoFingerprints(recs.toDS())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
  }

  test("identity, frame-order sensitivity, single-frame sensitivity") {
    val m = fpOf(Seq(
      clip(1L, Seq(1, 2, 3)),
      clip(2L, Seq(1, 2, 3)),  // identical
      clip(3L, Seq(3, 2, 1)),  // same frames, reordered
      clip(4L, Seq(1, 2, 4)))) // one frame differs
    assert(m.values.forall(_._1 == 3L))
    assert(m(1L) == m(2L), "identical clips diverged")
    assert(m(1L)._2 != m(3L)._2, "frame order lost — bag-of-frames hash")
    assert(m(1L)._2 != m(4L)._2, "single-frame change not detected")
    assert(m(1L)._2.matches("[0-9a-f]{16}"))
  }

  test("gate groups are real duplicate clips on the fixture") {
    val groups = Multimodal.mediaVideoFpGroups(spark, "/root/testdata/sf0.001")
      .collect()
    assert(groups.nonEmpty, "fixture carries no duplicate clips")
    groups.foreach { g =>
      assert(g.getLong(1) >= 2)
      assert(g.getLong(2) < g.getLong(3), "min_id/max_id order")
    }
  }
}
