package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
import java.awt.image.BufferedImage

/** Real JDK media codecs for the multimodal pipeline — no external
  * dependency: PNG/BMP through `javax.imageio`, WAV PCM through
  * `javax.sound.sampled`, and a trivial length-prefixed frame container
  * ("GFV1") for video whose frames are PNGs.
  *
  * Synthesis and decode are separate halves of the same contract: the
  * fixture path renders images/audio/video whose pixel and sample values
  * are analytic functions of a source text, and the decode path recovers
  * them through the actual codec (`ImageIO.read`, `AudioSystem
  * .getAudioInputStream`), so the DuckDB oracle can verify REAL decoded
  * output by recomputing the analytic function — the decode is no longer
  * a stub, yet stays oracle-checkable without DuckDB owning a codec.
  */
object MediaCodec {

  // ImageIO's default scratch-file cache would write a temp file per
  // encode/decode call on every executor — memory-only is both faster
  // and container-safe.
  ImageIO.setUseCache(false)

  // ── Images (PNG / BMP via ImageIO) ─────────────────────────────────

  /** Render a w×h 8-bit grayscale image; `pixel(i)` gives the value of
    * the i-th pixel in row-major order (masked to 0..255). */
  def grayImage(w: Int, h: Int, pixel: Int => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, pixel(i) & 0xff)
      i += 1
    }
    img
  }

  /** Encode a grayscale image to real PNG (or BMP &c — any ImageIO
    * writer format) bytes. */
  def encodeImage(w: Int, h: Int, pixel: Int => Int, format: String = "png")
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(grayImage(w, h, pixel), format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for $format")
    bos.toByteArray
  }

  final case class DecodedImage(width: Int, height: Int, pixels: Array[Int]) {
    def histogram16: Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < pixels.length) { hist(pixels(i) >> 4) += 1; i += 1 }
      hist
    }
    def pixelSum: Long = {
      var s = 0L; var i = 0
      while (i < pixels.length) { s += pixels(i); i += 1 }
      s
    }
  }

  /** Decode any ImageIO-supported image (format sniffed from the bytes —
    * PNG and BMP both route here). Band 0 of the raster is read
    * (grayscale sample; synthesized fixtures are single-band). */
  def decodeImage(bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("undecodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = raster.getSample(i % w, i / w, 0)
      i += 1
    }
    DecodedImage(w, h, px)
  }

  /** 64-bit average-hash (aHash) of a decoded image over an 8×8 block
    * grid — the classic perceptual near-dup fingerprint: bit `by*8+bx`
    * is set iff the block's mean pixel exceeds the GLOBAL pixel mean,
    * compared integer-exactly (`block_sum · w·h > total_sum ·
    * block_cnt` — no rational arithmetic, so an SQL oracle reproduces
    * the bits verbatim). Block bounds use the standard `x·8/w` floor
    * mapping, defined for any geometry (blocks may be empty below 8 px).
    * Returned as two 32-bit halves in Longs (`hi` = bits 32–63) so
    * downstream XOR/popcount never touches the BIGINT sign bit. */
  def aHash(img: DecodedImage): (Long, Long) = {
    val (w, h) = (img.width, img.height)
    val bSum = new Array[Long](64)
    val bCnt = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < img.pixels.length) {
      val b = ((i / w) * 8 / h) * 8 + ((i % w) * 8 / w)
      bSum(b) += img.pixels(i)
      bCnt(b) += 1
      total += img.pixels(i)
      i += 1
    }
    val n = w.toLong * h
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 64) {
      if (bSum(b) * n > total * bCnt(b)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    (hi, lo)
  }

  // ── Audio (WAV PCM 8-bit unsigned mono via javax.sound) ────────────

  /** Canonical fixture format: 8 kHz, 8-bit, mono. 8-bit WAV PCM is
    * unsigned by convention, so a sample byte round-trips as `b & 0xff`. */
  val WavSampleRate = 8000f

  def encodeWav(samples: Array[Byte], sampleRate: Float = WavSampleRate)
      : Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 8, 1, false /*unsigned*/ , false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class DecodedAudio(
      sampleRate: Float, nSamples: Long, samples: Array[Int]) {
    def durationMs: Long = nSamples * 1000L / sampleRate.toLong
    def histogram16: Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < samples.length) { hist(samples(i) >> 4) += 1; i += 1 }
      hist
    }
  }

  /** Decode a WAV through the real javax.sound parser: sample rate and
    * frame count come from the parsed header, samples from the stream. */
  def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"fixture WAVs are 8-bit mono, got $fmt")
      val raw = ais.readAllBytes()
      DecodedAudio(fmt.getSampleRate, ais.getFrameLength,
        raw.map(b => b & 0xff))
    } finally ais.close()
  }

  // ── Video (GFV1: length-prefixed PNG frames + duration header) ─────

  private val VideoMagic = Array[Byte]('G', 'F', 'V', '1')

  /** Container layout (little-endian):
    * magic "GFV1" | i32 durationMs | i32 frameCount | frameCount ×
    * (i32 byteLen | PNG bytes). */
  def encodeVideo(durationMs: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(VideoMagic)
    val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(durationMs).putInt(frames.length)
    bos.write(hdr.array())
    frames.foreach { f =>
      val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      len.putInt(f.length)
      bos.write(len.array())
      bos.write(f)
    }
    bos.toByteArray
  }

  final case class DecodedVideo(durationMs: Int, frames: Seq[DecodedImage])

  def decodeVideo(bytes: Array[Byte]): DecodedVideo = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, VideoMagic), "bad GFV1 magic")
    val durationMs = buf.getInt
    val frameCount = buf.getInt
    val frames = (0 until frameCount).map { _ =>
      val len = buf.getInt
      val fb = new Array[Byte](len)
      buf.get(fb)
      decodeImage(fb)
    }
    DecodedVideo(durationMs, frames)
  }
}
