package graft.streaming

import graft.Tables
import graft.text.KAnonymity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE release readout — every release dimension that can be
  * maintained per micro-batch, COMPOSED into one versioned release row
  * per source: corpus content ([[StreamManifest]]), quasi-identifier
  * risk raw and remediated ([[StreamKAnonymity]] + the ladder monoid
  * [[KAnonymity.ladderClassCounts]]), cross-split LEAKAGE
  * ([[StreamSplitLeakage.crossSplitFlags]] against the frozen near-dup
  * index — a distinct-set store, ∝ flagged docs), and string
  * CONTAMINATION ([[StreamContam.contamFlags]] against the frozen eval
  * shingles — a per-source counting monoid, each doc decidable at its
  * own arrival). Per batch: update all five underlying stores, then
  * join the versions this very batch wrote (all `v=batchId`) into
  * `(source, n_docs, total_chars, n_risk_docs, n_risk_docs_remediated,
  * n_leak_docs, n_contam_docs, releasable, releasable_remediated,
  * scope)` and write it as version `v=batchId` of the release store.
  *
  * `releasable` now blocks on the same three online dimensions the
  * batch gate blocks on minus exactly one: TRANSLATED contamination
  * (`bitext_decontam`) is NOT composable online, and the [[Scope]]
  * column states that IN the stored schema (not only here) so a reader
  * of the parquet store alone sees the verdict's coverage. The reason
  * is structural, not an implementation gap: the bitext ratio margin
  * normalizes each pair's cosine by both sides' local DENSITY over the
  * candidate corpus (Artetxe & Schwenk 2019), so one arriving candidate
  * changes the margins — and can flip the flags — of pairs it is not
  * part of; the flag set is a function of the WHOLE corpus, not of the
  * arriving document, hence no per-doc or counting monoid exists for
  * it (StreamReleaseSpec plants exactly this geometry and watches an
  * existing flag flip under one insertion). The write-funnel columns
  * (kept/dup/quality) stay with the batch gate for the same reason the
  * funnel itself is a batch job.
  *
  * Replay-idempotent for the [[StreamManifest]] reason, COMPOSED: all
  * inputs version by batchId (their merges read strictly-earlier
  * bases), so a re-delivered batch recomputes exactly the same input
  * versions and overwrites its own release version. A release review
  * reads ONE directory whose latest committed version is the current
  * releasability of the ingested corpus — without re-scanning it.
  *
  * Scale: per batch, the five updates cost partials ∝ batch (manifest,
  * k-anon, ladder, contamination) plus the index probe (∝ batch × band
  * hits) — nothing corpus-sized is scanned per batch: the doc→source
  * projection the leak path joins against its ALERT-sized hits is
  * frozen (materialized) with the index in [[pairFeeds]], and the
  * micro-batch itself is cached once in [[update]] so the five store
  * updates (and the leak path's two references) read one
  * materialization, not six re-reads of the source. External state:
  * sources + classes × levels bounded stores, plus the leak store ∝
  * flagged docs (alert-sized by the same argument as the near-dup
  * alert stream). */
object StreamRelease {

  /** The stored scope statement — what the ONLINE verdict covers, in
    * the schema itself (a verdict column whose coverage lives only in
    * scaladoc invites over-reading the parquet). */
  val Scope: String =
    "releasable = kanon+leakage+contamination; " +
      "translated-contamination and write-funnel verdicts are " +
      "batch-gate-only (bitext margin is corpus-relative)"

  /** The frozen pair-relation feeds the leak/contam maintainers probe:
    * the banded near-dup index, the indexed corpus's doc→source
    * projection, and the eval shingle table. Build ONCE before the
    * stream starts (the [[StreamNearDup.Index]] discipline). */
  final case class PairFeeds(index: StreamNearDup.Index,
                             corpusSources: DataFrame,
                             evalShingles: DataFrame)

  def pairFeeds(s: SparkSession, dir: String): PairFeeds = PairFeeds(
    StreamNearDup.buildIndex(s, dir),
    // frozen WITH the index (two narrow columns ∝ corpus docs — the
    // projection a production fleet ships next to the index): per-batch
    // leak joins read the materialized rows instead of re-scanning the
    // documents parquet every trigger
    Tables(s, dir, "documents")
      .select(col("doc_id").as("c_doc"), col("source").as("c_source"))
      .localCheckpoint(true),
    // eval side is benchmark-sized — materialize once, broadcast later
    StreamContam.evalShingles(s, dir).localCheckpoint(true))

  /** The composed readout from explicit relations — relation-first so
    * the spec can prove stream ≡ batch against the batch builders
    * ([[graft.sources.CorpusManifest.contentManifest]],
    * [[KAnonymity.classCounts]], [[KAnonymity.ladderClassCounts]], the
    * batch gate's leak/contam doc sets). `leakFlags` is the DISTINCT
    * (doc_id, source) leak-doc relation; `contamCounts` is the
    * per-source (source, n_contam_docs) rollup.
    *
    * Mid-stream leak accounting is CORPUS-level by design: a leaking
    * pair flags BOTH endpoints (the batch gate's rule), so a source's
    * `n_leak_docs` counts frozen-corpus partner docs that may not have
    * streamed yet — it can exceed `n_docs` before closure, and a source
    * implicated in a leak BEFORE any of its own docs arrive still gets
    * a row (n_docs = 0, releasable = false) via the source spine below
    * rather than silently dropping its flags. Both effects vanish at
    * corpus closure, where the row equals the batch gate's. */
  def compose(manifest: DataFrame, classes: DataFrame, ladder: DataFrame,
              leakFlags: DataFrame, contamCounts: DataFrame): DataFrame = {
    val risk = classes
      .filter(col("class_size") < KAnonymity.KAnon)
      .groupBy("source").agg(sum("class_size").as("n_risk_docs"))
    val remed = KAnonymity.remediatedBySource(ladder)
    val leak = leakFlags
      .groupBy("source").agg(count(lit(1)).as("n_leak_docs"))
    // source spine: manifest sources plus any leak-implicated source
    // with no ingested docs yet (all joins stay broadcast-left; at
    // closure the anti-join side is empty and the spine IS the manifest)
    val spine = manifest.select("source", "n_rows", "total_chars")
      .unionByName(
        leak.select("source") // one row per source already (rollup above)
          .join(manifest.select("source"), Seq("source"), "left_anti")
          .withColumn("n_rows", lit(0L))
          .withColumn("total_chars", lit(0L)))
    spine
      .join(broadcast(risk), Seq("source"), "left")
      .join(broadcast(remed), Seq("source"), "left")
      .join(broadcast(leak), Seq("source"), "left")
      .join(broadcast(contamCounts), Seq("source"), "left")
      .select(col("source"), col("n_rows").as("n_docs"),
        col("total_chars"),
        coalesce(col("n_risk_docs"), lit(0L)).as("n_risk_docs"),
        coalesce(col("n_risk_docs_remediated"), lit(0L))
          .as("n_risk_docs_remediated"),
        coalesce(col("n_leak_docs"), lit(0L)).as("n_leak_docs"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"))
      .withColumn("releasable",
        col("n_risk_docs") === 0L && col("n_leak_docs") === 0L &&
          col("n_contam_docs") === 0L)
      .withColumn("releasable_remediated",
        col("n_risk_docs_remediated") === 0L && col("n_leak_docs") === 0L &&
          col("n_contam_docs") === 0L)
      .withColumn("scope", lit(Scope))
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

  /** One idempotent micro-batch update of the leak-doc SET: union this
    * batch's cross-split flags into the latest earlier version and
    * dedup — set-union is idempotent under replay AND under the pair
    * rediscovery from a pair's second endpoint. Store ∝ flagged docs. */
  def updateLeak(s: SparkSession, base: String, feeds: PairFeeds,
                 batch: DataFrame, batchId: Long): Unit = {
    val bf = StreamSplitLeakage.crossSplitFlags(batch, feeds.index,
      feeds.corpusSources)
    val merged = StreamManifest.latestVersion(base, Some(batchId)) match {
      case Some(v) =>
        s.read.parquet(StreamManifest.versionDir(base, v))
          .unionByName(bf).distinct()
      case None => bf
    }
    merged.coalesce(1).write.mode("overwrite")
      .parquet(StreamManifest.versionDir(base, batchId))
  }

  /** One idempotent micro-batch update of the per-source contamination
    * counts: counts ADD under union because each document is decidable
    * (and therefore counted) exactly once, at its own arrival
    * ([[StreamContam]]); versioning by batchId makes replays no-ops. */
  def updateContam(s: SparkSession, base: String, feeds: PairFeeds,
                   batch: DataFrame, batchId: Long): Unit = {
    val bc = StreamContam.contamFlags(batch, feeds.evalShingles)
      .groupBy("source").agg(count(lit(1)).as("n_contam_docs"))
    val merged = StreamManifest.latestVersion(base, Some(batchId)) match {
      case Some(v) =>
        s.read.parquet(StreamManifest.versionDir(base, v))
          .unionByName(bc)
          .groupBy("source").agg(sum("n_contam_docs").as("n_contam_docs"))
      case None => bc
    }
    merged.coalesce(1).write.mode("overwrite")
      .parquet(StreamManifest.versionDir(base, batchId))
  }

  /** Store bases for the five underlying stores + the composed row. */
  final case class Bases(manifest: String, kanon: String, ladder: String,
                         leak: String, contam: String, release: String) {
    def all: Seq[String] =
      Seq(manifest, kanon, ladder, leak, contam, release)
  }

  /** One idempotent micro-batch update: maintain all five underlying
    * stores at `v=batchId`, then write their composition as `v=batchId`
    * of the release store. */
  def update(s: SparkSession, b: Bases, feeds: PairFeeds, batch: DataFrame,
             batchId: Long): Unit = {
    // one materialization of the micro-batch: the five store updates
    // (and the leak path's two references — index probe + source join)
    // read the cached rows instead of re-running the source projection
    // ~6× per trigger (the StormStream foreachBatch discipline)
    val cached = batch.cache()
    try {
      StreamManifest.update(s, b.manifest, cached, batchId)
      StreamKAnonymity.update(s, b.kanon, cached, batchId)
      updateLadder(s, b.ladder, cached, batchId)
      updateLeak(s, b.leak, feeds, cached, batchId)
      updateContam(s, b.contam, feeds, cached, batchId)
      def rd(base: String) =
        s.read.parquet(StreamManifest.versionDir(base, batchId))
      // sources-bounded relation: one file per version
      compose(rd(b.manifest), rd(b.kanon), rd(b.ladder), rd(b.leak),
          rd(b.contam))
        .coalesce(1).write.mode("overwrite")
        .parquet(StreamManifest.versionDir(b.release, batchId))
    } finally { cached.unpersist(); () }
  }

  /** The current release readout (None before the first batch). */
  def runningRelease(s: SparkSession, base: String): Option[DataFrame] =
    StreamManifest.latestVersion(base, None)
      .map(v => s.read.parquet(StreamManifest.versionDir(base, v)))

  /** Maintain the versioned release readout over a document stream
    * (`doc_id, text, lang, source` — the corpus ingest shape). */
  def maintain(docs: DataFrame, b: Bases, feeds: PairFeeds,
               checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        update(batch.sparkSession, b, feeds, batch, id)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
