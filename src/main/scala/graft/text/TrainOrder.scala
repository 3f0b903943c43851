package graft.text

import graft.Tables
import graft.sources.CorpusManifest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch ordering — the global shuffle a trainer consumes:
  * for each epoch, every survivor document gets a POSITION in a
  * pseudo-random permutation keyed by `sha256(epoch | doc_id)` (never
  * `rand()` — the [[Sampling]] discipline: reruns, retries and restarts
  * must see the identical order, and a resume from step N must read the
  * same doc N+1 the crashed run would have). Epochs reshuffle: the hash
  * is salted by the epoch index, so each epoch is an independent
  * permutation — the "different order every epoch, same order every
  * rerun" contract data loaders promise.
  *
  * Scale shape — rank WITHOUT a global sort bottleneck: position =
  * rank of the hash key, and a naive `row_number() OVER (ORDER BY key)`
  * funnels the corpus through ONE task. The planner reuses the
  * [[graft.sources.ShardPlan]] two-level pattern with the HASH PREFIX
  * as the block key: `bucket = okey div 2⁶⁰⁻ᴮ` (a range bucket, so
  * (bucket asc, okey asc) IS the global hash order), per-bucket counts
  * prefix-summed over the BUCKET relation (∝ 2ᴮ rows), offsets
  * broadcast back, and within-bucket `row_number` over hash-uniform
  * partitions (no hot key by construction — the hash is the
  * partitioner). The DuckDB oracle computes the naive global
  * `row_number`; hash equality proves the two-level rank exact.
  */
object TrainOrder {

  /** Epochs emitted by the gate (each an independent permutation). */
  val Epochs = 2

  /** Bucket bits: 2⁸ = 256 range buckets of the 60-bit hash space. */
  val BucketBits = 8

  /** 60-bit order key: sha256 of the salted doc key (the hex60
    * construction — [[graft.dedup.SubstringDedup]]'s fixed-width key). */
  private def okey(epoch: Column, docId: Column) =
    conv(substring(sha2(concat(lit("order|"), epoch, lit("|"), docId), 256),
      1, 15), 16, 10).cast("long")

  /** Per-epoch positions over any `(doc_id)` relation. */
  def orderOver(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"))
      .crossJoin(broadcast(docs.sparkSession.range(Epochs)
        .select(col("id").cast("int").as("epoch"))))
      .withColumn("okey", okey(col("epoch"), col("doc_id")))
      .withColumn("bucket",
        expr(s"okey div ${1L << (60 - BucketBits)}"))
      // read twice (bucket counts + placement) — materialize once
      .localCheckpoint(true)
    val bucketW = Window.partitionBy(col("epoch")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = keyed.groupBy("epoch", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("offset", sum(col("n")).over(bucketW) - col("n"))
      .select(col("epoch"), col("bucket"), col("offset"))
    val localW = Window.partitionBy(col("epoch"), col("bucket"))
      .orderBy(col("okey"), col("doc_id"))
    keyed.join(broadcast(offsets), Seq("epoch", "bucket"))
      .withColumn("position",
        col("offset") + row_number().over(localW) - 1)
      .select(col("epoch"), col("doc_id"), col("position"))
  }

  /** Gate: (epoch, doc_id, position) for the survivor corpus. */
  def trainOrder(s: SparkSession, dir: String): DataFrame =
    orderOver(CorpusManifest.survivors(s, dir).select("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "train_order" -> trainOrder)

  /** Oracle: the NAIVE global row_number over the hash order, per
    * epoch — exactness proves the two-level rank. */
  def oracles: Map[String, String] = Map(
    "train_order" ->
      (s"WITH RECURSIVE ${graft.dedup.DedupQueries.lshPairsCte},\n" +
        s"""${CorpusManifest.survCtesSql},
          |ep AS (SELECT unnest(range($Epochs))::INT AS epoch),
          |keyed AS (SELECT ep.epoch, s.doc_id,
          |    CAST('0x' || substr(sha256('order|' || ep.epoch || '|' ||
          |      s.doc_id), 1, 15) AS BIGINT) AS okey
          |  FROM surv s CROSS JOIN ep)
          |SELECT epoch, doc_id,
          |  (row_number() OVER (PARTITION BY epoch
          |     ORDER BY okey ASC, doc_id ASC) - 1)::BIGINT AS position
          |FROM keyed""".stripMargin))
}
