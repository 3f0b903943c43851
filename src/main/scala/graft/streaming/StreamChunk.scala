package graft.streaming

import graft.text.Chunking
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of document chunking — the ingest-time segmentation a
  * live RAG indexer runs: each arriving document explodes into its
  * sliding token windows with provenance, ready for embedding and
  * upsert. The projection IS [[Chunking.chunk]] — one shared stateless
  * `explode(sequence)/slice` tree, so stream ≡ batch holds by
  * construction: no watermark, no state store, append mode; micro-batch
  * boundaries cannot split a document because the fan-out happens inside
  * one row's projection. */
object StreamChunk {

  /** Chunk a (doc_id, text) stream: same output schema as the batch
    * `chunk_documents` gate query. */
  def chunksOverStream(docs: DataFrame): DataFrame = Chunking.chunk(docs)

  def outputMode: OutputMode = OutputMode.Append()
}
