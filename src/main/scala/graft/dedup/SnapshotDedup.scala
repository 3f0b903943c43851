package graft.dedup

import graft.dedup.DedupQueries.{JaccardThreshold, bands, bandsSql,
  minhashSelect, minhashSignatures, prunedShingles, shinglesCte, shpCte}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (snapshot-delta) near-duplicate detection — the shape a
  * 100 TB pipeline actually runs day to day. Nobody re-clusters the
  * whole corpus per ingest: the standing corpus keeps a banded MinHash
  * INDEX (one (band, bucket-hash) row per doc per band — a few dozen
  * bytes/doc, stored alongside the data), and each new batch is banded
  * the same way and equi-joined against that index. Work is
  * O(batch + matched buckets), independent of corpus size; the full
  * self-join dedup (`dedup_minhash_lsh`) remains the periodic global
  * compaction pass behind it.
  *
  * Here the fixture plays both roles deterministically: docs with
  * `doc_id % [[BatchMod]] == 0` (~20%) are the incoming batch, the rest
  * are the indexed corpus. Candidates come from the batch×index band
  * join (NOT a self-join — no a&lt;b ordering; a new doc matching an old
  * one is reported whichever id is larger), then exact-Jaccard
  * verification over the candidates only, exactly as in the LSH
  * pipeline. The oracle replays minhash + banding + the split in DuckDB
  * from the shared CTE strings, so both engines derive the pair set
  * from byte-identical signatures.
  *
  * The streaming face of this operator is [[graft.streaming.StreamNearDup]]
  * (frozen broadcast index, rows scored as they arrive); this is the
  * batch ingest face, where the index side is corpus-sized and must be
  * a shuffle join, not a broadcast.
  */
object SnapshotDedup {

  /** Split modulus: doc_id % BatchMod == 0 → the new batch (~1/BatchMod
    * of docs at every SF — the split is defined by arithmetic, not by a
    * fixed id boundary, so it scales with the fixture). */
  val BatchMod = 5

  /** (new_id, old_id, common, jaccard) pairs: new-batch docs that are
    * near-duplicates (exact Jaccard >= [[JaccardThreshold]]) of an
    * already-indexed doc, candidate-bounded by the band join. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val sh = prunedShingles(s, dir)
    val bb = bands(minhashSignatures(sh).localCheckpoint(true))
    val isNew = col("doc_id") % BatchMod === 0
    val cands = bb.filter(isNew).as("x").join(bb.filter(!isNew).as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("old_id"))
      .distinct()

    // Exact verification over candidates only (the LSH verification
    // shape): candidate pairs are few, the shingle joins touch only them.
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cands
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
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("new_id"), col("old_id"), col("common"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental" -> dedupIncremental)

  val oracles: Map[String, String] = Map(
    "dedup_incremental" ->
      (s"WITH $shinglesCte,\n$shpCte,\n$minhashSelect,\n$bandsSql,\n" +
        s"""cands AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
          |          FROM bands x JOIN bands y
          |            ON x.band = y.band AND x.bh = y.bh
          |          WHERE x.doc_id % $BatchMod = 0
          |            AND y.doc_id % $BatchMod <> 0),
          |sizes AS (SELECT doc_id, count(*) AS n FROM shp GROUP BY doc_id),
          |common AS (SELECT a.doc_id AS new_id, b.doc_id AS old_id,
          |             count(*) AS common
          |           FROM shp a JOIN shp b ON a.s = b.s
          |           WHERE a.doc_id % $BatchMod = 0
          |             AND b.doc_id % $BatchMod <> 0
          |           GROUP BY 1, 2)
          |SELECT c.new_id, c.old_id, m.common,
          |  round(m.common * 1.0 / (sa.n + sb.n - m.common), 4) AS jaccard
          |FROM cands c
          |JOIN common m ON m.new_id = c.new_id AND m.old_id = c.old_id
          |JOIN sizes sa ON sa.doc_id = c.new_id
          |JOIN sizes sb ON sb.doc_id = c.old_id
          |WHERE m.common * 1.0 / (sa.n + sb.n - m.common)
          |  >= $JaccardThreshold""".stripMargin))
}
