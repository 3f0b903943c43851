package graft.streaming

import graft.SparkTestSession
import graft.dedup.{DedupQueries, SnapshotDedup}
import graft.dedup.DedupQueries.{MaxShingleDf, NumPerms}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The daily-delta deployment shape, stream ≡ batch: freeze the
  * near-dup index over the INDEXED corpus only (docs with
  * doc_id % BatchMod != 0), replay the NEW batch as a stream through
  * [[StreamNearDup.matchesOverStream]], and the alerts must be exactly
  * `dedup_incremental`'s pairs — same ids, same Jaccard — regardless
  * of micro-batching. This pins the contract that the streaming filter
  * and the batch ingest pass share one definition of "near-dup of the
  * corpus": same pruning domain (full-corpus df cap), same signatures,
  * same banding, same verification arithmetic. */
class StreamIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed new-batch alerts equal batch dedup_incremental") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val isNew = col("doc_id") % SnapshotDedup.BatchMod === 0

    val batch = SnapshotDedup.dedupIncremental(spark, sf)
      .select(least(col("new_id"), col("old_id")).as("a_id"),
        greatest(col("new_id"), col("old_id")).as("b_id"),
        col("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixture must contain cross-split near-dups")

    // Frozen index over the OLD side only; the pruning domain stays the
    // full corpus (a per-doc signature depends only on the doc's own
    // pruned shingles, so filtering before or after signing is the same
    // relation — the contract SnapshotDedup's split relies on).
    val shOld = DedupQueries.prunedShingles(spark, sf).filter(!isNew)
    val mhOld = DedupQueries.minhashSignatures(shOld).localCheckpoint(true)
    val stop = DedupQueries.shingles(spark, sf)
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxShingleDf)
      .select("s").as[String].collect().toSeq.sorted
    val idx = StreamNearDup.Index(
      DedupQueries.bands(mhOld)
        .select(col("doc_id").as("c_doc"), col("band"), col("bh")),
      shOld.groupBy(col("doc_id").as("c_doc"))
        .agg(collect_set(col("s")).as("c_sh"))
        .select(col("c_doc"), col("c_sh"), size(col("c_sh")).as("c_n")),
      mhOld.select(col("doc_id").as("c_doc"),
        array((0 until NumPerms).map(j => col(s"h$j")): _*).as("c_sig")),
      stop)

    val newDocs = graft.Tables(spark, sf, "documents").filter(isNew)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamNearDup.matchesOverStream(
      mem.toDS().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("incremental_stream")
      .outputMode(StreamNearDup.outputMode).start()
    try {
      val (b1, rest) = newDocs.splitAt(newDocs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("incremental_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(streamed == batch,
        s"stream/batch drift: stream-only=${streamed -- batch}, " +
          s"batch-only=${batch -- streamed}")
    } finally q.stop()
  }
}
