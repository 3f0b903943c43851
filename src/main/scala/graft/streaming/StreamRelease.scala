package graft.streaming

import graft.text.KAnonymity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE release readout — the governance surfaces that maintain
  * themselves per micro-batch ([[StreamManifest]] for corpus content,
  * [[StreamKAnonymity]] for quasi-identifier class counts, and the
  * ladder monoid [[KAnonymity.ladderClassCounts]] for remediation)
  * COMPOSED into one versioned release row per source, the streaming
  * face of [[graft.operators.ReleaseReport]]'s monoid-maintainable
  * columns: per batch, update all three underlying stores, then join
  * the latest committed versions (all `v=batchId` — the versions this
  * very batch just wrote) into `(source, n_docs, total_chars,
  * n_risk_docs, n_risk_docs_remediated, releasable,
  * releasable_remediated)` and write it as version `v=batchId` of the
  * release store.
  *
  * The remediated column works online because the WHOLE remediation
  * derivation is monoid-expressible: ladder class counts split by
  * source add under union, class sizes re-aggregate from them, the
  * budget-chosen level is a 5-row readout of those sizes, and the
  * per-source suppressed mass is a bounded join back — no per-doc
  * state, ever ([[KAnonymity.remediatedBySource]], proven ≡ the batch
  * release gate's column in StreamReleaseSpec).
  *
  * Replay-idempotent for the [[StreamManifest]] reason, COMPOSED: all
  * inputs version by batchId (their merges read strictly-earlier
  * bases), so a re-delivered batch recomputes exactly the same input
  * versions and therefore exactly the same release row, and overwrites
  * its own release version. A release review reads ONE directory whose
  * latest committed version is the current releasability of the
  * ingested corpus — without ever re-scanning it.
  *
  * Scope (stated, not silent): the composed columns are the
  * monoid-maintainable ones — corpus size/content and k-anonymity risk,
  * raw and remediated. The pair-relation blockers (split leakage, eval
  * contamination) are not counting monoids — they need the
  * cross-document pair joins the BATCH release gate composes
  * ([[graft.operators.ReleaseReport]]), and their online twins
  * ([[StreamSplitLeakage]], [[StreamNearDup]]) already maintain the
  * underlying pair feeds separately. `releasable` here therefore means
  * "no quasi-identifier risk", the release dimension that CAN be kept
  * current at ingest cost ∝ batch.
  *
  * Scale: per batch, work is the three underlying updates (partials ∝
  * batch, state ∝ sources + classes × levels) plus bounded joins —
  * nothing corpus-sized; external state ∝ (sources + classes × levels)
  * × retained versions. */
object StreamRelease {

  /** The composed readout from explicit manifest / class-count / ladder
    * relations — the join the versioned stores feed; relation-first so
    * the spec can prove stream ≡ batch against
    * [[graft.sources.CorpusManifest.contentManifest]] +
    * [[KAnonymity.classCounts]] + [[KAnonymity.ladderClassCounts]] over
    * the full prefix. */
  def compose(manifest: DataFrame, classes: DataFrame,
              ladder: DataFrame): DataFrame = {
    val risk = classes
      .filter(col("class_size") < KAnonymity.KAnon)
      .groupBy("source").agg(sum("class_size").as("n_risk_docs"))
    val remed = KAnonymity.remediatedBySource(ladder)
    manifest
      .join(broadcast(risk), Seq("source"), "left")
      .join(broadcast(remed), Seq("source"), "left")
      .select(col("source"), col("n_rows").as("n_docs"),
        col("total_chars"),
        coalesce(col("n_risk_docs"), lit(0L)).as("n_risk_docs"),
        coalesce(col("n_risk_docs_remediated"), lit(0L))
          .as("n_risk_docs_remediated"))
      .withColumn("releasable", col("n_risk_docs") === 0L)
      .withColumn("releasable_remediated",
        col("n_risk_docs_remediated") === 0L)
  }

  /** One idempotent micro-batch update of the ladder monoid (the
    * [[StreamKAnonymity.update]] law on the remediation key). */
  def updateLadder(s: SparkSession, base: String, batch: DataFrame,
                   batchId: Long): Unit = {
    val bc = KAnonymity.ladderClassCounts(batch)
    val merged = StreamManifest.latestVersion(base, Some(batchId)) match {
      case Some(v) =>
        KAnonymity.mergeLadder(
          s.read.parquet(StreamManifest.versionDir(base, v)), bc)
      case None => bc
    }
    // classes × levels × sources — domain-bounded: one file per version
    merged.coalesce(1).write.mode("overwrite")
      .parquet(StreamManifest.versionDir(base, batchId))
  }

  /** One idempotent micro-batch update: maintain all three underlying
    * stores at `v=batchId`, then write their composition as `v=batchId`
    * of the release store. */
  def update(s: SparkSession, manifestBase: String, kanonBase: String,
             ladderBase: String, releaseBase: String, batch: DataFrame,
             batchId: Long): Unit = {
    StreamManifest.update(s, manifestBase, batch, batchId)
    StreamKAnonymity.update(s, kanonBase, batch, batchId)
    updateLadder(s, ladderBase, batch, batchId)
    val manifest = s.read.parquet(
      StreamManifest.versionDir(manifestBase, batchId))
    val classes = s.read.parquet(
      StreamManifest.versionDir(kanonBase, batchId))
    val ladder = s.read.parquet(
      StreamManifest.versionDir(ladderBase, batchId))
    // sources-bounded relation: one file per version
    compose(manifest, classes, ladder).coalesce(1).write.mode("overwrite")
      .parquet(StreamManifest.versionDir(releaseBase, batchId))
  }

  /** The current release readout (None before the first batch). */
  def runningRelease(s: SparkSession, base: String): Option[DataFrame] =
    StreamManifest.latestVersion(base, None)
      .map(v => s.read.parquet(StreamManifest.versionDir(base, v)))

  /** Maintain the versioned release readout over a document stream
    * (`doc_id, text, lang, source` — the corpus ingest shape). */
  def maintain(docs: DataFrame, manifestBase: String, kanonBase: String,
               ladderBase: String, releaseBase: String,
               checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        update(b.sparkSession, manifestBase, kanonBase, ladderBase,
          releaseBase, b, id)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
