package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup's contract: it only ever pairs a new-batch doc with
  * an indexed doc (never batch×batch or index×index), every reported
  * pair's Jaccard is truly >= the threshold (candidates are verified,
  * not trusted), and its result is exactly the cross-split restriction
  * of the symmetric LSH pipeline — the delta pass finds precisely what
  * the global pass would have found across the same boundary (same
  * signatures, same bands, so identical recall by construction). */
class SnapshotDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pairs are strictly batch-to-index and verified") {
    val out = SnapshotDedup.dedupIncremental(spark, sf).cache()
    try {
      assert(out.filter(col("new_id") % SnapshotDedup.BatchMod =!= 0 ||
        col("old_id") % SnapshotDedup.BatchMod === 0).count() == 0,
        "pair crosses the wrong side of the batch/index split")
      assert(out.filter(col("jaccard") < DedupQueries.JaccardThreshold)
        .count() == 0, "unverified candidate leaked through")
    } finally out.unpersist()
  }

  test("delta pass equals the global pass restricted to the boundary") {
    val isNew = (c: org.apache.spark.sql.Column) =>
      c % SnapshotDedup.BatchMod === 0
    // Symmetric global LSH pairs (a_id < b_id), re-oriented (new, old)
    // and restricted to pairs crossing the split.
    val cross = DedupQueries.dedupMinhashLsh(spark, sf)
      .filter(isNew(col("a_id")) =!= isNew(col("b_id")))
      .select(
        when(isNew(col("a_id")), col("a_id")).otherwise(col("b_id"))
          .as("new_id"),
        when(isNew(col("a_id")), col("b_id")).otherwise(col("a_id"))
          .as("old_id"),
        col("jaccard"))
    val delta = SnapshotDedup.dedupIncremental(spark, sf)
      .select(col("new_id"), col("old_id"), col("jaccard"))
    assert(delta.except(cross).count() == 0 &&
      cross.except(delta).count() == 0,
      "incremental result drifted from the global pass's cross-split pairs")
  }
}
