package graft.streaming

import graft.SparkTestSession
import graft.sources.CorpusManifest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for online manifest maintenance: after N uneven
  * micro-batches the running manifest must equal the from-scratch
  * recompute over everything streamed (the monoid law, applied
  * iteratively), and a replayed batch must not change it (idempotent
  * versioned merge). */
class StreamManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def snapshot(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap

  test("running manifest after N batches == from-scratch recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = CorpusManifest.survivors(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect()

    val base = java.nio.file.Files
      .createTempDirectory("graft-stream-manifest").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-manifest-ckpt").toString
    // 4 uneven batches, one of them a single row
    val (b1, rest) = rows.splitAt(rows.length / 4)
    val (b2, rest2) = rest.splitAt(1)
    val (b3, b4) = rest2.splitAt(rest2.length / 2)

    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = StreamManifest.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source", "n_chars"),
      base, ckpt)
    try Seq(b1, b2, b3, b4).foreach { b =>
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val running = snapshot(StreamManifest.runningManifest(spark, base).get)
    val scratch = snapshot(CorpusManifest.contentManifest(
      CorpusManifest.survivors(spark, dir)))
    assert(running == scratch,
      "iterated monoid merge must equal the one-pass recompute")

    // replay idempotence: re-delivering the LAST batch under its own
    // batchId must reproduce the same manifest — the merge base is the
    // version strictly BEFORE it, never itself
    val lastV = StreamManifest.latestVersion(base, None).get
    StreamManifest.update(spark, base,
      b4.toIndexedSeq.toDF("doc_id", "text", "lang", "source", "n_chars"),
      lastV)
    val afterReplay = snapshot(StreamManifest.runningManifest(spark, base).get)
    assert(afterReplay == scratch, "a replayed batch must be a no-op")

    // retention: compacting to the last 2 versions preserves the running
    // manifest AND the next batch's merge base, and actually deletes
    val nVersionsBefore = StreamManifest.latestVersion(base, None).get + 1
    val deleted = StreamManifest.compactVersions(base, 2)
    assert(deleted == (nVersionsBefore - 2).toInt, "old versions deleted")
    val afterCompact = snapshot(StreamManifest.runningManifest(spark, base).get)
    assert(afterCompact == scratch, "compaction must not move the manifest")
    // a subsequent batch still merges against the retained latest
    StreamManifest.update(spark, base,
      Seq((999999L, "tail doc words", "en", "src0", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), lastV + 1)
    val afterNext = snapshot(StreamManifest.runningManifest(spark, base).get)
    assert(afterNext("src0")._1 == scratch("src0")._1 + 1,
      "post-compaction merge must extend the running manifest")
  }
}
