package graft.streaming

import graft.text.KAnonymity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE k-anonymity maintenance — the governance audit kept current
  * as the corpus ingests, the [[StreamManifest]] discipline applied to
  * the quasi-identifier class counts: class sizes are a pure counting
  * monoid (counts add under union), so the running audit updates from
  * each micro-batch ALONE — never a corpus re-scan. Per micro-batch:
  *
  *   1. the batch's class counts (one pass, partials ∝ classes);
  *   2. read the latest version STRICTLY BEFORE this batchId;
  *   3. the algebraic merge (union + sum by class key);
  *   4. write as version `v=<batchId>`.
  *
  * Replay-idempotent for exactly the [[StreamManifest]] reason: a
  * re-delivered batch re-merges against the same strictly-earlier base
  * and overwrites its own version. The readout face ([[runningAudit]])
  * derives the `at_risk` flag from the latest committed counts — the
  * same relation the batch `k_anonymity` gate emits, proven
  * stream ≡ batch in StreamKAnonymitySpec. Engine streaming state is
  * O(0) (the twin plan is stateless); external state ∝ classes ×
  * retained versions (the class domain is bounded — tens of KBs).
  *
  * Why online: k-anonymity risk is a RELEASE blocker
  * ([[graft.operators.ReleaseReport]]); a pipeline that only audits at
  * release time discovers a poisoned quasi-identifier distribution
  * after ingesting 100 TB. This maintains the readout at ingest cost
  * ∝ batch. */
object StreamKAnonymity {

  /** The audit's class-count relation — the batch gate's OWN
    * definition ([[KAnonymity.classCounts]]), not a twin restatement,
    * so the streamed key can never drift from the audited one. */
  def classCounts(docs: DataFrame): DataFrame =
    KAnonymity.classCounts(docs)

  /** Monoid merge: counts add by class key. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("lang", "source", "len_bucket")
      .agg(sum("class_size").as("class_size"))

  /** One idempotent micro-batch update (the versioned-merge law). */
  def update(s: SparkSession, base: String, batch: DataFrame,
             batchId: Long): Unit = {
    val bc = classCounts(batch)
    val merged = StreamManifest.latestVersion(base, Some(batchId)) match {
      case Some(v) =>
        mergeCounts(s.read.parquet(StreamManifest.versionDir(base, v)), bc)
      case None => bc
    }
    // class-domain-bounded relation: one file per version
    merged.coalesce(1).write.mode("overwrite")
      .parquet(StreamManifest.versionDir(base, batchId))
  }

  /** The current audit (None before the first batch): the latest
    * committed class counts with the `at_risk` flag — column-for-column
    * the batch `k_anonymity` gate's output. */
  def runningAudit(s: SparkSession, base: String): Option[DataFrame] =
    StreamManifest.latestVersion(base, None).map { v =>
      s.read.parquet(StreamManifest.versionDir(base, v))
        .select(col("lang"), col("source"), col("len_bucket"),
          col("class_size"),
          (col("class_size") < KAnonymity.KAnon).as("at_risk"))
    }

  /** Maintain the running audit over a document stream. */
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
