package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The codec contract: real JDK encode→decode round-trips recover the
  * exact analytic pixel/sample values the fixtures are rendered with. */
class MediaCodecSpec extends AnyFunSuite {

  test("hand-built 2x2 PNG decodes to exact known pixels") {
    // pixels row-major: (0,0)=10 (1,0)=20 (0,1)=200 (1,1)=255
    val want = Array(10, 20, 200, 255)
    val png = MediaCodec.encodeImage(2, 2, want(_))
    // PNG magic — proves a real container was written, not a fake
    assert((png(0) & 0xff) == 0x89 &&
      png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val d = MediaCodec.decodeImage(png)
    assert(d.width == 2 && d.height == 2)
    assert(d.pixels.toSeq == want.toSeq)
    assert(d.pixelSum == 485L)
    // bins: 10→0, 20→1, 200→12, 255→15
    assert(d.histogram16.toSeq ==
      Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 0L, 0L, 1L))
  }

  test("BMP decodes through the same sniffing path") {
    val want = Array(0, 128, 64, 255, 1, 2)
    val bmp = MediaCodec.encodeImage(3, 2, want(_), "bmp")
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    val d = MediaCodec.decodeImage(bmp)
    assert(d.width == 3 && d.height == 2)
    assert(d.pixels.toSeq == want.toSeq)
  }

  test("WAV round-trip recovers header rate, frame count, and samples") {
    val samples = "hello wav".getBytes("UTF-8")
    val wav = MediaCodec.encodeWav(samples)
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    val a = MediaCodec.decodeWav(wav)
    assert(a.sampleRate == 8000f)
    assert(a.nSamples == samples.length.toLong)
    assert(a.samples.toSeq == samples.map(_ & 0xff).toSeq)
    assert(a.durationMs == samples.length * 1000L / 8000L)
  }

  test("GFV1 container round-trips duration and per-frame pixels") {
    val frames = Seq(
      MediaCodec.encodeImage(2, 1, i => 3 + i),
      MediaCodec.encodeImage(2, 1, i => 100 + i))
    val v = MediaCodec.decodeVideo(MediaCodec.encodeVideo(4321, frames))
    assert(v.durationMs == 4321)
    assert(v.frames.map(_.pixels.toSeq) == Seq(Seq(3, 4), Seq(100, 101)))
  }

  test("media table decode matches the analytic formulas end-to-end") {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media).collect()
    val docs = {
      import spark.implicits._
      graft.Tables.parallel(spark, dir, "documents")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
    }
    assert(feats.length == docs.size)
    feats.foreach { f =>
      val t = docs(f.id).getBytes("UTF-8")
      val n = t.length
      f.kind match {
        case "image" =>
          val m = math.min(n, Multimodal.ImgCropK)
          val w = 8 + m % 32; val h = 8 + (m * 7) % 24
          assert(f.meta.width == w && f.meta.height == h)
          assert(f.meta.duration_ms == 0 && f.meta.n_frames == 1)
          // decoded histogram == analytic cropped-tile histogram with the
          // last-4-byte tail stamp
          val hist = new Array[Long](16)
          (0 until w * h).foreach { i =>
            val v = if (n >= 4 && i >= w * h - 4) t(n - (w * h - i)) else t(i % m)
            hist((v & 0xff) >> 4) += 1
          }
          assert(f.histogram.toSeq == hist.toSeq, s"image ${f.id}")
        case "audio" =>
          assert(f.meta.width == 0 && f.meta.height == 0)
          assert(f.meta.duration_ms == n * 1000 / 8000)
          assert(f.meta.n_frames == 0)
          assert(f.histogram.sum == n.toLong)
        case "video" =>
          assert(f.meta.n_frames == 1 + n % 12)
          assert(f.meta.duration_ms == 1000 + n % 60000)
          assert(f.meta.width == 8 && f.meta.height == 8)
          assert(f.histogram.sum == f.meta.n_frames * 64L)
      }
    }
    // all three kinds present
    assert(feats.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("resize plan scales only above the edge cap, aspect-preserving") {
    val spark = SparkTestSession.spark
    val plans = Multimodal
      .planResize(Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001"),
        Multimodal.GateResizeMaxEdge)
      .collect()
    val (big, small) = plans.filter(_.kind == "image")
      .partition(p => math.max(p.width, p.height) > 24)
    assert(big.nonEmpty && small.nonEmpty, "both branches must fire")
    small.foreach(p => assert(p.out_width == p.width && p.out_height == p.height))
    big.foreach { p =>
      val edge = math.max(p.width, p.height)
      assert(math.max(p.out_width, p.out_height) == 24 ||
        math.max(p.out_width, p.out_height) == math.max(p.width, p.height) * 24 / edge)
      assert(p.out_width == p.width * 24 / edge)
      assert(p.out_height == p.height * 24 / edge)
      assert(p.est_pixels == p.out_width * p.out_height)
    }
    plans.filter(_.kind == "audio").foreach { p =>
      assert(p.width == 0 && p.out_width == 0 && p.est_pixels == 0)
    }
  }
}
