package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * as opaque `binary` columns with typed metadata, decoded/feature-extracted
  * per partition (the batch shape a real codec wants: initialize the decoder
  * once per partition, stream records through it — the Scala analog of a
  * Pandas-UDF `mapInPandas` stage).
  *
  * ── DECODER IS A STUB ──
  * This container ships no image/audio codecs, so [[StubDecoder]] computes a
  * deterministic fake "decode" from the raw bytes (dimensions from byte
  * length, a 16-bin byte histogram standing in for pixel statistics). The
  * Spark-side plumbing — binary column, typed Dataset, partition-batched
  * extraction, nested metadata schema — is the real, tested part; swap
  * [[StubDecoder.decode]] for a codec call to productionize.
  */
object Multimodal {

  final case class MediaRecord(id: Long, kind: String, bytes: Array[Byte])

  final case class MediaMeta(
      byte_len: Int, width: Int, height: Int, duration_ms: Int, n_frames: Int)

  final case class MediaFeatures(
      id: Long, kind: String, meta: MediaMeta, histogram: Array[Long])

  /** Deterministic fake decoder (see class doc). One instance per partition
    * mirrors real decoder lifecycle (expensive init, cheap per-record). */
  final class StubDecoder {
    def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val width = if (kind == "audio") 0 else 64 + n % 640
      val height = if (kind == "audio") 0 else 64 + (n * 7) % 480
      val duration = if (kind == "image") 0 else 1000 + n % 60000
      val frames = kind match {
        case "image" => 1
        case "audio" => 0
        case _ => 1 + n % 300
      }
      MediaMeta(n, width, height, duration, frames)
    }

    /** 16-bin histogram over the high nibble of each byte — the stand-in
      * for per-channel pixel statistics. */
    def histogram(bytes: Array[Byte]): Array[Long] = {
      val h = new Array[Long](16)
      var i = 0
      while (i < bytes.length) {
        h((bytes(i) & 0xff) >> 4) += 1
        i += 1
      }
      h
    }

    /** Unsigned byte sum — seed for the per-frame stub fingerprint. */
    def byteSum(bytes: Array[Byte]): Long = {
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      s
    }
  }

  final case class FrameSample(
      id: Long, kind: String, frame_idx: Long, ts_ms: Long, frame_sig: Long)

  final case class ResizePlan(
      id: Long, kind: String, width: Long, height: Long,
      out_width: Long, out_height: Long, est_bytes: Long)

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes of the
    * text (opaque to everything downstream), kind cycling image/audio/video. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.parallel(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRecord]
  }

  /** The partition-batched decode/feature-extract stage. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new StubDecoder // once per partition
      it.map(r => MediaFeatures(r.id, r.kind,
        decoder.decode(r.kind, r.bytes), decoder.histogram(r.bytes)))
    }
  }

  /** Frame sampling — the one-to-many decode stage (video → every
    * `stride`-th frame with its timestamp and a deterministic stub
    * fingerprint). Same per-partition decoder lifecycle as
    * [[extractFeatures]]; the fan-out happens inside the partition
    * iterator, so no shuffle is introduced and downstream operators see
    * ordinary rows. Audio records (0 frames) emit nothing; images emit
    * their single frame. */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int = 10): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new StubDecoder // once per partition
      it.flatMap { r =>
        val meta = decoder.decode(r.kind, r.bytes)
        if (meta.n_frames <= 0) Iterator.empty
        else {
          val bs = decoder.byteSum(r.bytes)
          Iterator.range(0, meta.n_frames, stride).map { f =>
            FrameSample(r.id, r.kind, f.toLong,
              f.toLong * meta.duration_ms / meta.n_frames,
              (bs * 31 + f) % 1000000007L)
          }
        }
      }
    }
  }

  /** Gate query: sampled frames with timestamps + stub fingerprints. */
  def mediaFrameSample(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir)).toDF()

  /** Resize planning — the bounded-resolution normalization step (e.g.
    * cap the long edge at 224 px before feature extraction). The stub
    * plans the output geometry from the decoded dimensions with integer
    * arithmetic: aspect-preserving floor division, byte estimate scaled
    * by the area ratio. Audio (no geometry) passes through unchanged. A
    * real implementation swaps the arithmetic for a codec scale call in
    * the same mapPartitions stage. */
  val ResizeMaxEdge = 224L

  def planResize(ds: Dataset[MediaRecord]): Dataset[ResizePlan] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new StubDecoder // once per partition
      it.map { r =>
        val m = decoder.decode(r.kind, r.bytes)
        val (w, h) = (m.width.toLong, m.height.toLong)
        if (w <= 0 || h <= 0) ResizePlan(r.id, r.kind, w, h, w, h, m.byte_len)
        else {
          val edge = math.max(w, h)
          val (ow, oh) =
            if (edge <= ResizeMaxEdge) (w, h)
            else (w * ResizeMaxEdge / edge, h * ResizeMaxEdge / edge)
          ResizePlan(r.id, r.kind, w, h, ow, oh,
            m.byte_len.toLong * (ow * oh) / (w * h))
        }
      }
    }
  }

  /** Gate query: aspect-preserving resize plan per media record. */
  def mediaResize(s: SparkSession, dir: String): DataFrame =
    planResize(mediaFromDocuments(s, dir)).toDF()

  /** Gate query: typed metadata per media record. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(s, dir))
      .select(col("id"), col("kind"), col("meta.byte_len"), col("meta.width"),
        col("meta.height"), col("meta.duration_ms"), col("meta.n_frames"))

  /** Gate query: per-kind byte-histogram totals (bin, count). */
  def mediaHistogram(s: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(s, dir))
    feats
      .select(col("kind"), posexplode(col("histogram")).as(Seq("bin", "cnt")))
      .groupBy("kind", "bin")
      .agg(sum("cnt").as("total"))
      .filter(col("total") > 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> mediaMeta,
    "media_histogram" -> mediaHistogram,
    "media_frame_sample" -> mediaFrameSample,
    "media_resize" -> mediaResize)

  // Oracle twins: documents text is ASCII, so byte length == char length and
  // byte values == character codes — the SQL can reproduce the stub decode
  // arithmetic exactly.
  val oracles: Map[String, String] = Map(
    "media_meta" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT id, kind, n AS byte_len,
        |  CASE WHEN kind = 'audio' THEN 0 ELSE 64 + n % 640 END AS width,
        |  CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (n * 7) % 480 END AS height,
        |  CASE WHEN kind = 'image' THEN 0 ELSE 1000 + n % 60000 END AS duration_ms,
        |  CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0
        |    ELSE 1 + n % 300 END AS n_frames
        |FROM m""".stripMargin,
    "media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |g AS (
        |  SELECT id, kind, n,
        |    (CASE WHEN kind = 'audio' THEN 0 ELSE 64 + n % 640 END)::BIGINT
        |      AS width,
        |    (CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (n * 7) % 480 END)::BIGINT
        |      AS height
        |  FROM m),
        |p AS (
        |  SELECT id, kind, n, width, height,
        |    greatest(width, height) AS edge
        |  FROM g)
        |SELECT id, kind, width, height,
        |  CASE WHEN width <= 0 OR height <= 0 OR edge <= 224 THEN width
        |       ELSE width * 224 // edge END AS out_width,
        |  CASE WHEN width <= 0 OR height <= 0 OR edge <= 224 THEN height
        |       ELSE height * 224 // edge END AS out_height,
        |  CASE WHEN width <= 0 OR height <= 0 THEN n
        |       WHEN edge <= 224 THEN n
        |       ELSE n * ((width * 224 // edge) * (height * 224 // edge))
        |            // (width * height) END AS est_bytes
        |FROM p""".stripMargin,
    "media_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS n,
        |    list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ord(substr(text, i, 1))))::BIGINT AS byte_sum
        |  FROM documents),
        |f AS (
        |  SELECT id, kind, byte_sum,
        |    CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0
        |      ELSE 1 + n % 300 END AS n_frames,
        |    CASE WHEN kind = 'image' THEN 0 ELSE 1000 + n % 60000 END
        |      AS duration_ms
        |  FROM m),
        |s AS (
        |  SELECT id, kind, n_frames, duration_ms, byte_sum,
        |    unnest(range(0, n_frames, 10)) AS frame_idx
        |  FROM f WHERE n_frames > 0)
        |SELECT id, kind, frame_idx,
        |  (frame_idx * duration_ms) // n_frames AS ts_ms,
        |  (byte_sum * 31 + frame_idx) % 1000000007 AS frame_sig
        |FROM s""".stripMargin,
    "media_histogram" ->
      """WITH chars AS (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |           ELSE 'video' END AS kind,
        |    unnest(list_transform(range(1, length(text) + 1),
        |      i -> ord(substr(text, i, 1)) // 16)) AS bin
        |  FROM documents)
        |SELECT kind, bin, count(*)::BIGINT AS total
        |FROM chars GROUP BY kind, bin""".stripMargin)
}
