package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-budgeted output shard planning — the file-sizing half of the
  * write-side story. [[CorpusManifest]] proves the survivors land as
  * one sorted file per source; its own Scaladoc notes that at 100 TB
  * "sources are replaced by finer buckets to cap file size". This
  * operator IS that bucketing, made first-class and deterministic: for
  * each source, documents (ordered by `doc_id`, the manifest's sort
  * order) are laid out head-to-tail and cut into shards of
  * [[TargetShardBytes]] — a document belongs to the shard where it
  * STARTS (`shard_ix = start_offset div target`), the standard
  * packing rule, so every shard except a source's last holds at least
  * the target bytes and no shard exceeds target + one document. File
  * size is the quantity that actually gates a 100 TB write (small
  * files melt the namenode and the scan scheduler; giant files break
  * task granularity), and a plan keyed on DATA (byte offsets) rather
  * than on execution (task splits) is reproducible across cluster
  * sizes — the property the oracle certifies.
  *
  * Scale shape — the distributed prefix sum: a naive
  * `sum() OVER (PARTITION BY source ORDER BY doc_id)` sorts an entire
  * source inside one task, the hot-key shape that dies first at scale
  * (the `quality_lm_score` lesson). The planner runs the classic
  * two-level scan instead:
  *   1. block subtotals — docs are bucketed by `doc_id div`
  *      [[BlockDocs]] and one `groupBy(source, blk)` computes block
  *      byte totals (map-side partials; shuffle ∝ blocks = docs /
  *      BlockDocs);
  *   2. block start offsets — a running sum over the BLOCK relation
  *      (window ∝ blocks per source, three orders smaller than docs);
  *   3. local placement — offsets broadcast back (the block relation
  *      is corpus/BlockDocs-sized: pick BlockDocs so it stays
  *      broadcastable — ~10⁵ blocks at 100 TB with production block
  *      sizing) and each doc's start = block offset + within-block
  *      running sum, a window over ≤ [[BlockDocs]] rows.
  * The result is integer-exact equal to the naive cumsum (integer
  * addition is associative — no float drift), which is exactly what
  * the DuckDB oracle computes the naive way; `ShardPlanSpec` asserts
  * the same equivalence in-engine.
  */
object ShardPlan {

  /** Target shard size in bytes. Fixture-scaled (survivor sources run
    * ~4–60 KB) so plans are non-trivially multi-shard at every SF;
    * production uses 256 MB–1 GB — the planner is size-agnostic. */
  val TargetShardBytes = 2048L

  /** Docs per prefix-sum block (`doc_id div BlockDocs`). Chosen with
    * the broadcast bound in mind: blocks ≈ corpus / BlockDocs must fit
    * a broadcast (at 100 TB, block ≈ tens of MB keeps blocks ≈ 10⁵). */
  val BlockDocs = 256L

  /** Per-document shard placement over any `(source, doc_id, text)`
    * relation: the two-level prefix sum, ending in `start` (byte
    * offset of the doc within its source's layout) and `shard_ix`. */
  def placed(surv: DataFrame): DataFrame = {
    val d = surv.select(col("source"), col("doc_id"),
      length(col("text")).cast("long").as("bytes"),
      expr(s"doc_id div $BlockDocs").as("blk"))
      // read twice (block subtotals + placement) — materialize once,
      // nothing pinned after the action completes (house pattern)
      .localCheckpoint(true)
    val blockW = Window.partitionBy(col("source")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = d.groupBy("source", "blk")
      .agg(sum(col("bytes")).as("blk_bytes"))
      .withColumn("blk_start",
        sum(col("blk_bytes")).over(blockW) - col("blk_bytes"))
      .select(col("source"), col("blk"), col("blk_start"))
    val localW = Window.partitionBy(col("source"), col("blk"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offsets), Seq("source", "blk"))
      .withColumn("start",
        col("blk_start") + sum(col("bytes")).over(localW) - col("bytes"))
      .withColumn("shard_ix", expr(s"start div $TargetShardBytes"))
  }

  /** Gate: the shard plan for the funnel-survivor corpus — per
    * (source, shard) the doc count, byte fill and id range a writer
    * (or a reader planning splits) consumes. */
  def shardPlan(s: SparkSession, dir: String): DataFrame =
    placed(CorpusManifest.survivors(s, dir))
      .groupBy("source", "shard_ix")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shard_plan" -> shardPlan)

  /** Oracle: the NAIVE single-window cumsum over the replayed survivor
    * relation — hash equality proves the two-level prefix sum exact. */
  def oracles: Map[String, String] = Map(
    "shard_plan" ->
      (s"WITH RECURSIVE ${graft.dedup.DedupQueries.lshPairsCte},\n" +
        s"""${CorpusManifest.survCtesSql},
          |c AS (SELECT source, doc_id, length(text)::BIGINT AS bytes,
          |        (sum(length(text)) OVER (PARTITION BY source
          |           ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          |         - length(text))::BIGINT AS start
          |      FROM surv)
          |SELECT source, (start // $TargetShardBytes)::BIGINT AS shard_ix,
          |  count(*)::BIGINT AS n_docs, sum(bytes)::BIGINT AS bytes,
          |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
          |FROM c GROUP BY 1, 2""".stripMargin))
}
