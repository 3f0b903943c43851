package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.audioFingerprints]] — exact bit semantics on hand-built
  * WAV clips with KNOWN window energies, plus the invariances the
  * energy-delta code exists for (Haitsma & Kalker 2002): identical
  * recordings share a fingerprint, and a uniform gain change preserves
  * every delta bit. */
class AudioFpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** samples as unsigned bytes centered on 128. */
  private def clip(id: Long, windows: Seq[Int]): Multimodal.MediaRecord = {
    val samples = windows.flatMap(level =>
      Seq.fill(Multimodal.AudioFpWin)((128 + level).toByte)).toArray
    Multimodal.MediaRecord(id, "audio", MediaCodec.encodeWav(samples))
  }

  private def fpOf(recs: Seq[Multimodal.MediaRecord]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Multimodal.audioFingerprints(recs.toDS())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("delta bits match hand-computed energies; partial window counted") {
    // windows quiet/loud/quiet/loud: e = 0, 800, 0, 800
    // bit0: e1>e0 -> 1; bit1: e2>e1 -> 0; bit2: e3>e2 -> 1  => fp = 5
    val m = fpOf(Seq(clip(1L, Seq(0, 10, 0, 10))))
    assert(m(1L) == ((4L, 5L)))
    // monotonically rising energies -> all bits set
    val rising = fpOf(Seq(clip(2L, Seq(0, 1, 2, 3, 4))))
    assert(rising(2L) == ((5L, 15L)))
    // a trailing PARTIAL window still forms a window (ceil division):
    // 9 samples at one level = full quiet window + 1-sample loud tail
    val partial = {
      val samples = (Seq.fill(8)(128.toByte) :+ (128 + 10).toByte).toArray
      fpOf(Seq(Multimodal.MediaRecord(3L, "audio",
        MediaCodec.encodeWav(samples))))
    }
    assert(partial(3L) == ((2L, 1L)), "partial tail window lost")
  }

  test("identical recordings share fp; uniform gain preserves all bits") {
    val base = Seq(3, 0, 7, 2, 9, 9, 1)
    val doubled = base.map(_ * 2)
    val m = fpOf(Seq(clip(10L, base), clip(11L, base), clip(12L, doubled)))
    assert(m(10L) == m(11L), "identical clips diverged")
    assert(m(10L)._2 == m(12L)._2,
      "uniform gain changed the delta bits — the invariance the " +
        "energy-DIFFERENCE code exists for")
    // equal-energy plateau (9, 9) must NOT set a bit: strict inequality
    assert(((m(10L)._2 >> 4) & 1L) == 0L, "plateau set a bit")
  }

  test("fingerprint caps at AudioFpMaxBits + 1 windows") {
    val long = fpOf(Seq(clip(20L, 0 until 50)))
    assert(long(20L)._1 == Multimodal.AudioFpMaxBits + 1L)
  }
}
