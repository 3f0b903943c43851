package graft.streaming

import graft.SparkTestSession
import graft.sources.CorpusManifest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming corpus sink must be CONTENT-identical to the batch
  * writer: same survivors streamed in uneven micro-batches produce a
  * directory whose per-source rows / id range / chars / XOR checksum
  * equal the batch gate's manifest exactly — only the physical layout
  * (n_files, sort) differs, which is the documented compaction story. */
class StreamCorpusSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed append content == batch-written corpus (checksums)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // the batch gate's artifact (also writes it) — drop n_files
    val batch = CorpusManifest.corpusManifest(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap

    val rows = CorpusManifest.survivors(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect()

    val out = java.nio.file.Files
      .createTempDirectory("graft-stream-corpus").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-corpus-ckpt").toString
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = StreamCorpusSink.writeSurvivors(
      mem.toDS().toDF("doc_id", "text", "lang", "source", "n_chars"),
      out, ckpt)
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = CorpusManifest.manifestOf(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(streamed.keys.map(_._1).toSet == batch.keySet)
    // content columns identical per source; layout differs by design
    streamed.foreach { case ((src, nFiles), content) =>
      assert(content == batch(src), s"content drift for $src")
      assert(nFiles >= 1L && nFiles <= 3L,
        s"$src: $nFiles files for 3 micro-batches")
    }
  }
}
