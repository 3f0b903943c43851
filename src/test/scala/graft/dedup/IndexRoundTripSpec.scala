package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The operational claim behind incremental dedup — "the standing
  * corpus keeps a banded MinHash index stored alongside the data" —
  * exercised for real: write the index side's band relation to parquet,
  * read it back in a fresh DataFrame lineage, band-join the new batch
  * against the STORED index, and the verified pairs must equal
  * `dedup_incremental`'s (which recomputes the index in-query). Proves
  * the index is self-contained on disk: nothing the join needs lives
  * only in the writer's session state. */
class IndexRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("band join against a parquet-persisted index equals in-query") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_band_index").toString
    try {
      val isNew = col("doc_id") % SnapshotDedup.BatchMod === 0
      val sh = DedupQueries.prunedShingles(spark, sf)
      val bb = DedupQueries.bands(
        DedupQueries.minhashSignatures(sh).localCheckpoint(true))

      // persist the INDEX side (old docs) as the stored artifact
      bb.filter(!isNew).write.mode("overwrite").parquet(tmp)
      val stored = spark.read.parquet(tmp)

      val cands = bb.filter(isNew).as("x").join(stored.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
        .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("old_id"))
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val fromStored = cands
        .join(sh.as("a"), col("new_id") === col("a.doc_id"))
        .join(sh.as("b"),
          col("old_id") === col("b.doc_id") && col("a.s") === col("b.s"))
        .groupBy("new_id", "old_id")
        .agg(count(lit(1)).as("common"))
        .join(sizes.withColumnRenamed("doc_id", "new_id")
          .withColumnRenamed("n", "na"), "new_id")
        .join(sizes.withColumnRenamed("doc_id", "old_id")
          .withColumnRenamed("n", "nb"), "old_id")
        .withColumn("jaccard",
          col("common") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= DedupQueries.JaccardThreshold)
        .select(col("new_id"), col("old_id"), col("common"),
          round(col("jaccard"), 4).as("jaccard"))

      val inQuery = SnapshotDedup.dedupIncremental(spark, sf)
      assert(fromStored.except(inQuery).count() == 0 &&
        inQuery.except(fromStored).count() == 0,
        "stored-index pairs differ from the in-query pipeline")
    } finally {
      // clean the scratch index
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
