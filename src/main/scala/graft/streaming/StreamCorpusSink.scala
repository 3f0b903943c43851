package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the corpus WRITE side
  * ([[graft.sources.CorpusManifest]] is the batch/compaction face): an
  * ingest stream of survivor documents appended continuously to the
  * partitioned parquet corpus via the exactly-once file sink. The file
  * sink commits each micro-batch's files atomically through its
  * manifest log, so replayed batches never double-write — CONTENT is
  * exactly the union of the input batches (the spec proves the
  * order-independent checksums match the batch writer's byte for
  * byte).
  *
  * What streaming ingest does NOT give you — and why the batch gate
  * stays the periodic pass — is LAYOUT: each micro-batch closes its
  * own files per partition (n_files grows with batches, no
  * within-file sort), which is exactly the production
  * small-files/compaction story: continuous append + a scheduled
  * `corpus_manifest`-shaped rewrite (repartition + sort + one file
  * per key). State: none — the sink is append-only, O(0) state at any
  * rate; the only driver-side growth is the sink's file manifest log,
  * ∝ files committed. */
object StreamCorpusSink {

  /** Append a survivor stream to `outDir` partitioned by source. */
  def writeSurvivors(docs: DataFrame, outDir: String,
                     checkpoint: String): StreamingQuery =
    docs.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("source")
      .outputMode("append")
      .start()
}
