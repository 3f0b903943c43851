package graft.streaming

import graft.multimodal.{CdcChunks, Multimodal}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.multimodal.CdcChunks]] — the ingest-time
  * shape of storage dedup: each arriving media payload is decoded and
  * content-defined-chunked inside the partition iterator, emitting its
  * (id, hash, len) chunk instances for a downstream interning store
  * (which keys on (hash, len) exactly as the batch rollup does).
  * STATELESS append — chunk boundaries depend only on the record's own
  * bytes, so micro-batching cannot change any chunk and stream ≡ batch
  * instance relations are set-equal ([[CdcChunks.chunkRecord]] is the
  * single per-record kernel both sides run). */
object StreamCdc {

  /** Chunk instances of a [[Multimodal.MediaRecord]] stream. */
  def chunksOverStream(media: Dataset[Multimodal.MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(CdcChunks.chunkRecord)).toDF()
  }

  def outputMode: OutputMode = OutputMode.Append()
}
