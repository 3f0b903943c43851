package graft.streaming

import graft.dedup.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming face of eval-set string decontamination
  * ([[DedupQueries.decontaminate]]) — the per-document face: the eval
  * side is FROZEN (its distinct-shingle table broadcast,
  * [[DedupQueries.evalShingleTable]]), and whether an arriving corpus
  * document shares ≥ [[DedupQueries.DecontamMinOverlap]] trigram
  * shingles with any eval document depends on that document and the
  * frozen eval set ALONE — so contamination is decidable at ingest,
  * each document flags at most once (when it arrives), and the
  * per-source contaminated-doc count is a counting MONOID the release
  * readout can maintain per micro-batch ([[StreamRelease]]). Contrast
  * the TRANSLATED contamination gate (`bitext_decontam`), whose
  * ratio-margin score is corpus-relative and therefore NOT
  * per-document decidable — proven by a planted geometry in
  * StreamReleaseSpec, and the reason the online release verdict scopes
  * it out.
  *
  * Scale: per batch, one projection of the batch's distinct trigrams
  * joined against the broadcast eval shingles (tiny by construction —
  * the eval set is a fixed benchmark suite), partials ∝ batch matches. */
object StreamContam {

  /** The frozen eval shingle table (eval_id, s) for a corpus dir. */
  def evalShingles(s: SparkSession, dir: String): DataFrame =
    DedupQueries.evalShingleTable(s, dir)

  /** Contamination flags of one arriving batch against the frozen eval
    * shingles: DISTINCT (doc_id, source) of every arriving CORPUS doc
    * (eval ids excluded, the [[DedupQueries.decontaminate]] split)
    * whose distinct-trigram overlap with some eval doc reaches the
    * threshold — exactly the batch gate's flagged-doc set restricted
    * to this batch. */
  def contamFlags(batch: DataFrame, evalSh: DataFrame): DataFrame = {
    // projection and threshold are the BATCH definitions
    // ([[DedupQueries.shingleProjection]] / [[DedupQueries
    // .contamPairsBy]]), not restatements — the stream ≡ batch
    // contamination equality the release verdict rests on cannot drift
    val sh = DedupQueries.shingleProjection(
      batch.filter(col("doc_id") >= DedupQueries.DecontamEvalDocs),
      keep = Seq("source"))
    DedupQueries.contamPairsBy(sh.join(broadcast(evalSh), "s"),
        Seq("doc_id", "source", "eval_id"))
      .select(col("doc_id"), col("source")).distinct()
  }
}
