package graft.streaming

import graft.sources.CorpusManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE manifest maintenance — the monoid law `manifest_delta`
  * hash-certifies in batch, folded into the streaming ingest path: as
  * survivor batches append to the corpus ([[StreamCorpusSink]]), the
  * per-source manifest (rows / id range / chars / order-independent
  * sha-XOR) is updated from each micro-batch ALONE — never a corpus
  * re-scan. Per micro-batch the work is:
  *
  *   1. the batch's content manifest (one pass over the batch rows,
  *      partials ∝ sources);
  *   2. read the current running manifest (∝ sources — tens of rows);
  *   3. the algebraic merge ([[CorpusManifest.mergeManifests]] — counts
  *      and chars add, ranges min/max, XOR composes);
  *   4. write the merged manifest as version `v=<batchId>`.
  *
  * Exactly-once under replay: `foreachBatch` may re-deliver a batch
  * after recovery, and a blind read-merge-write would fold it in twice
  * (the XOR would cancel but the counts would double). Versioning by
  * batchId makes the update IDEMPOTENT: the merge always reads the
  * latest version STRICTLY BEFORE the current batchId, so a replayed
  * batch recomputes exactly the same merge from exactly the same base
  * and overwrites its own version — the same manifest-log discipline
  * the file sink itself uses for data files.
  *
  * State: none in the streaming engine (the query plan is stateless —
  * plan-locked as the `corpus_manifest_stream` twin); the external
  * state is the manifest directory, ∝ sources × versions retained.
  * At 100 TB the per-batch cost is ∝ batch + sources, the law
  * `manifest_delta` proves exactly.
  */
object StreamManifest {

  def versionDir(base: String, v: Long): String = f"$base/v=$v%09d"

  /** Latest committed version strictly below `before` (the replay-safe
    * merge base), or the overall latest when `before` is None. */
  def latestVersion(base: String, before: Option[Long]): Option[Long] = {
    val d = new java.io.File(base)
    val vs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(v => before.forall(v < _))
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The current running manifest (None before the first batch). */
  def runningManifest(s: SparkSession, base: String): Option[DataFrame] =
    latestVersion(base, None)
      .map(v => s.read.parquet(versionDir(base, v)))

  /** One idempotent micro-batch update: merge the batch's manifest into
    * the latest version before `batchId`, write as `v=batchId`. */
  def update(s: SparkSession, base: String, batch: DataFrame,
             batchId: Long): Unit = {
    val mb = CorpusManifest.contentManifest(batch)
    val merged = latestVersion(base, Some(batchId)) match {
      case Some(v) => CorpusManifest.mergeManifests(
        s.read.parquet(versionDir(base, v)), mb)
      case None => mb
    }
    // sources-bounded relation: one file keeps the version dir tidy
    merged.coalesce(1).write.mode("overwrite")
      .parquet(versionDir(base, batchId))
  }

  /** Retention sweep: delete all but the newest `keep` versions. Safe
    * at any moment because every merge reads only versions STRICTLY
    * BEFORE its own batchId, and replay of batch b needs the latest
    * version < b — so as long as `keep >= 1` the running manifest and
    * the NEXT batch's merge base both survive; only replays older than
    * the retained window lose their exact base (they re-merge against
    * a newer version — the at-least-once window every retention policy
    * trades; state the trade, keep the default generous). */
  def compactVersions(base: String, keep: Int): Int = {
    require(keep >= 1, "retention must keep at least the running manifest")
    val d = new java.io.File(base)
    val vs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .sortBy(_.getName)
    val drop = vs.dropRight(keep)
    drop.foreach { dir =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    drop.length
  }

  /** Maintain the running manifest over a survivor-document stream. */
  def maintain(docs: DataFrame, base: String,
               checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        update(b.sparkSession, base, b, id)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
