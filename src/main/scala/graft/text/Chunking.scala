package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document chunking — the context-window segmentation step of a training
  * / RAG ingestion pipeline: split each document into fixed-size token
  * windows with overlap, keeping per-chunk provenance (doc id, chunk
  * ordinal, start-token offset) so downstream stages can trace a training
  * sequence back to its source span.
  *
  * Complements [[Sampling]]'s `pack_sequences` (concat-and-cut across
  * documents): chunking never crosses a document boundary and preserves
  * overlap, the shape retrieval indexing and long-doc pretraining use.
  *
  * Scale shape: a pure per-row projection — tokenize, compute the chunk
  * count arithmetically, `explode(sequence(...))`, `slice` the token
  * array. Zero shuffle, whole-stage codegen end to end; output rows ≈
  * docs × (tokens / stride), each carrying only its own slice. At 100 TB
  * the stage is embarrassingly parallel and bounded by scan + write.
  */
object Chunking {

  /** Window size in tokens. */
  val ChunkTokens = 32

  /** Stride between window starts; `ChunkTokens - ChunkStride` = overlap
    * (8 tokens) carried between adjacent chunks. */
  val ChunkStride = 24

  /** One row per (doc, window): sliding token windows of
    * [[ChunkTokens]] every [[ChunkStride]], last window clipped at the
    * document end; a document shorter than one window yields exactly one
    * chunk. Chunk k covers tokens `[k·stride, k·stride + size)`.
    *
    * Works on any `(doc_id, text)` relation, batch OR streaming — the
    * projection is stateless, so [[graft.streaming.StreamChunk]] reuses
    * it verbatim and stream ≡ batch holds by construction. */
  def chunk(docs: DataFrame): DataFrame = {
    val t = ChunkTokens; val st = ChunkStride
    docs
      .select(col("doc_id"), TextQueries.words(col("text")).as("w"))
      .withColumn("n", size(col("w")))
      // last window index: 0 when everything fits in one window, else
      // ceil((n - t) / st) — the first start whose window reaches the end
      .withColumn("lastk",
        when(col("n") <= t, lit(0))
          .otherwise(expr(s"(n - $t + ${st - 1}) div $st")))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), col("lastk"))).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * st).cast("long").as("start_token"),
        size(slice(col("w"), col("chunk_idx") * st + 1, lit(t)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("w"), col("chunk_idx") * st + 1, lit(t)), " ")
          .as("chunk_text"))
  }

  /** Gate query: [[chunk]] over the `documents` table. */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame =
    chunk(Tables.parallel(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_documents" -> chunkDocuments)

  val oracles: Map[String, String] = Map(
    "chunk_documents" ->
      s"""WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, len(w) AS n,
        |    CASE WHEN len(w) <= $ChunkTokens THEN 0
        |      ELSE (len(w) - $ChunkTokens + ${ChunkStride - 1})
        |           // $ChunkStride END AS lastk
        |  FROM w),
        |k AS (
        |  SELECT doc_id, w, n, unnest(range(0, lastk + 1)) AS k FROM c)
        |SELECT doc_id, k AS chunk_idx,
        |  (k * $ChunkStride)::BIGINT AS start_token,
        |  len(list_slice(w, (k * $ChunkStride + 1)::INT,
        |    (k * $ChunkStride + $ChunkTokens)::INT))::BIGINT
        |    AS n_chunk_tokens,
        |  array_to_string(list_slice(w, (k * $ChunkStride + 1)::INT,
        |    (k * $ChunkStride + $ChunkTokens)::INT), ' ') AS chunk_text
        |FROM k""".stripMargin)
}
