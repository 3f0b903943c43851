package graft.streaming

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of the multimodal decode/feature stage — the
  * ingest-time path a live media pipeline runs: binary payloads arrive
  * as records, each micro-batch decodes through the SAME per-partition
  * codec lifecycle ([[Multimodal.extractFeatures]] is reused verbatim on
  * the streaming Dataset), and typed features flow on. Stateless append
  * mode: decode is per-record, so micro-batch boundaries cannot change
  * any feature and stream ≡ batch is exact. */
object StreamMedia {

  /** Decode a stream of media records into flat typed features
    * (id, kind, byte_len, width, height, duration_ms, n_frames,
    * histogram). */
  def featuresOverStream(media: Dataset[Multimodal.MediaRecord]): DataFrame =
    Multimodal.extractFeatures(media)
      .select(col("id"), col("kind"),
        col("meta.byte_len"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.n_frames"), col("histogram"))

  /** Ingest-time audio fingerprinting — [[Multimodal.audioFingerprints]]
    * verbatim on the streaming Dataset (stateless mapPartitions decode,
    * so stream ≡ batch exactly). */
  def audioFpOverStream(media: Dataset[Multimodal.MediaRecord]): DataFrame =
    Multimodal.audioFingerprints(media)

  /** Ingest-time video fingerprinting — same reuse. */
  def videoFpOverStream(media: Dataset[Multimodal.MediaRecord]): DataFrame =
    Multimodal.videoFingerprints(media)

  def outputMode: OutputMode = OutputMode.Append()
}
