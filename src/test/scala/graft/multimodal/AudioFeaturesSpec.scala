package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Audio feature contract: energy / zero-crossings / peak computed from
  * the REAL decoded WAV samples, checked against hand-computed values on
  * a hand-built clip, plus decode-side invariants on the gate output. */
class AudioFeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hand-built WAV round-trips to exact hand-computed features") {
    // centered samples: +2, -3, +1, 0, -1 → crossings at (+2,-3), (-3,+1),
    // (+1..0..-1: 0 breaks the strict sign product, then 0→-1 is not a
    // strict flip either) = 2; energy = 4+9+1+0+1 = 15; peak = 3
    val raw = Array(130, 125, 129, 128, 127).map(_.toByte)
    val a = MediaCodec.decodeWav(MediaCodec.encodeWav(raw))
    assert(a.samples.toSeq == Seq(130, 125, 129, 128, 127))

    var energy = 0L; var zc = 0L; var peak = 0L; var prev = 0
    a.samples.zipWithIndex.foreach { case (v, i) =>
      val c = v - 128
      energy += c.toLong * c
      if (c.abs > peak) peak = c.abs.toLong
      if (i > 0 && prev * c < 0) zc += 1
      prev = c
    }
    assert(energy == 15L)
    assert(zc == 2L)
    assert(peak == 3L)
  }

  test("gate output matches an independent per-document recomputation") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = Multimodal.mediaAudioFeatures(spark, sf)
      .as[Multimodal.AudioFeatures].collect().map(f => f.id -> f).toMap

    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter { case (_, t) =>
        val b = t.getBytes("UTF-8")
        b.take(Multimodal.KindPrefixK).map(_ & 0xff).sum % 3 == 1
      }
    assert(texts.nonEmpty && got.size == texts.length)

    texts.foreach { case (id, t) =>
      val s = t.getBytes("UTF-8").map(_ & 0xff)
      val c = s.map(_ - 128)
      val f = got(id)
      assert(f.n_samples == s.length.toLong, s"doc $id n_samples")
      assert(f.energy == c.map(x => x.toLong * x).sum, s"doc $id energy")
      assert(f.peak == c.map(_.abs.toLong).max, s"doc $id peak")
      val zc = c.sliding(2).count {
        case Array(a, b) => a * b < 0
        case _           => false
      }
      assert(f.zero_crossings == zc.toLong, s"doc $id crossings")
    }
  }
}
