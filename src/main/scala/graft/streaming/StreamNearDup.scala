package graft.streaming

import graft.dedup.DedupQueries
import graft.dedup.DedupQueries.{JaccardThreshold, MaxShingleDf, MinhashPrime,
  NumBands, NumPerms, PermA, PermB, RowsPerBand}
import graft.text.TextQueries.{hex32, trigrams, words}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming near-duplicate / decontamination filter — the deployment
  * twin of [[DedupQueries.dedupMinhashLsh]]: the existing corpus is
  * frozen into a banded MinHash index ONCE (batch), and every arriving
  * document is checked against it as it lands — the shape a crawl
  * ingest pipeline runs ("is this page a near-dup of anything we
  * already hold?") and the streaming form of eval-set decontamination.
  *
  * The whole per-document pipeline is STATELESS projections: the
  * arriving document's shingle set, MinHash signature, and band keys
  * are array expressions over its own row (the batch side's per-doc
  * `groupBy(min)` collapses to `array_min(transform(...))` over the
  * in-row shingle array — identical values, since both fold the same
  * universal-hash transforms over the same distinct-shingle set), and
  * candidates come from an INNER stream-static equi-join on
  * (band, band-hash) against the frozen index — Spark's supported
  * stateless stream-static join, so a micro-batch of one document
  * probes the index exactly like a batch of a million. Verification
  * (exact Jaccard via `array_intersect` against the matched corpus
  * doc's shingle array) and the signature-estimate column are further
  * projections over two more static joins. The one stateful operator
  * is the final `dropDuplicates` that collapses multi-band hits of the
  * same pair — its state is alert-count sized, and a production query
  * bounds it with `dropDuplicatesWithinWatermark`.
  *
  * The frozen stop-shingle list (corpus shingles with df >
  * [[MaxShingleDf]]) ships with the index as a literal array — it is
  * boilerplate-sized by construction — so the stream prunes exactly
  * the shingles the batch signatures never saw.
  */
object StreamNearDup {

  /** The frozen corpus index: banded buckets, per-doc shingle arrays
    * (pruned; with sizes), per-doc signatures, and the stop-shingle
    * list the pruning removed. All static DataFrames — build once,
    * reuse for the life of the stream. */
  final case class Index(bands: DataFrame, shingleArrs: DataFrame,
                         sigs: DataFrame, stopShingles: Seq[String])

  def buildIndex(s: SparkSession, dir: String): Index = {
    import s.implicits._
    val sh = DedupQueries.prunedShingles(s, dir)
    val mh = DedupQueries.minhashSignatures(sh).localCheckpoint(true)
    val bandTbl = DedupQueries.bands(mh)
      .select(col("doc_id").as("c_doc"), col("band"), col("bh"))
    val arrs = sh.groupBy(col("doc_id").as("c_doc"))
      .agg(collect_set(col("s")).as("c_sh"))
      .select(col("c_doc"), col("c_sh"), size(col("c_sh")).as("c_n"))
    val sigTbl = mh.select(col("doc_id").as("c_doc"),
      array((0 until NumPerms).map(j => col(s"h$j")): _*).as("c_sig"))
    val stop = DedupQueries.shingles(s, dir)
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxShingleDf)
      .select("s").as[String].collect().toSeq.sorted
    Index(bandTbl, arrs, sigTbl, stop)
  }

  /** In-row MinHash signature of a distinct-shingle array column —
    * the same single sha256 per shingle + [[NumPerms]] universal-hash
    * mins as the batch [[DedupQueries.minhashSignatures]]. */
  private def sigExpr(shArr: Column): Column = {
    val hs = transform(shArr, x => pmod(hex32(x), lit(MinhashPrime)))
    array((0 until NumPerms).map { j =>
      array_min(transform(hs,
        h => (h * PermA(j) + PermB(j)) % MinhashPrime))
    }: _*)
  }

  /** In-row band keys of a signature array — the batch banding recipe
    * ([[DedupQueries.bands]]): per band, the 16-hex prefix of sha256
    * over the comma-joined row values. */
  private def bandExpr(sig: Column): Column =
    array((0 until NumBands).map { b =>
      val rows = (0 until RowsPerBand).map(r =>
        element_at(sig, b * RowsPerBand + r + 1).cast("string"))
      struct(lit(b).as("band"),
        substring(sha2(concat_ws(",", rows: _*), 256), 1, 16).as("bh"))
    }: _*)

  /** The verified-match relation BEFORE pair normalization — one row
    * per (arriving doc, corpus partner, band hit) above the exact
    * Jaccard threshold, the arriving side still identified as `s_doc`.
    * Shared trunk of [[matchesOverStream]] (which adds the signature
    * estimate and canonicalizes) and [[rawMatches]] (which keeps the
    * orientation for consumers that must ATTRIBUTE the hit, e.g. the
    * cross-split release flags). */
  private def verified(docs: DataFrame, idx: Index): DataFrame = {
    val stopLit = array(idx.stopShingles.map(lit(_)): _*)
      .cast("array<string>")
    val enriched = docs
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("s_sh",
        array_except(array_distinct(trigrams(col("w"))), stopLit))
      .filter(size(col("s_sh")) > 0)
      .withColumn("s_sig", sigExpr(col("s_sh")))
      .select(col("doc_id").as("s_doc"), col("s_sh"),
        size(col("s_sh")).as("s_n"), col("s_sig"),
        explode(bandExpr(col("s_sig"))).as("bb"))
      .select(col("s_doc"), col("s_sh"), col("s_n"), col("s_sig"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    enriched
      .join(idx.bands, Seq("band", "bh")) // stream-static inner equi-join
      .filter(col("c_doc") =!= col("s_doc"))
      .join(idx.shingleArrs, "c_doc")
      .withColumn("common", size(array_intersect(col("s_sh"), col("c_sh"))))
      .withColumn("jaccard",
        col("common") / (col("s_n") + col("c_n") - col("common")))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** Arriving (doc_id, text) stream → verified near-dup alerts
    * (a_id, b_id, est_jaccard, jaccard) in the batch query's canonical
    * (min, max) orientation and rounding. */
  def matchesOverStream(docs: DataFrame, idx: Index): DataFrame = {
    val est = (0 until NumPerms).map(j =>
      when(element_at(col("s_sig"), j + 1) ===
        element_at(col("c_sig"), j + 1), 1).otherwise(0)).reduce(_ + _)
    verified(docs, idx)
      .join(idx.sigs, "c_doc")
      .select(
        least(col("s_doc"), col("c_doc")).as("a_id"),
        greatest(col("s_doc"), col("c_doc")).as("b_id"),
        round(est.cast("double") / NumPerms, 4).as("est_jaccard"),
        round(col("jaccard"), 4).as("jaccard"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Verified matches with the ARRIVING side kept identified:
    * (s_doc, c_doc, jaccard), multi-band hits collapsed. For consumers
    * that must attribute the hit to the stream side vs the frozen side
    * ([[StreamSplitLeakage.crossSplitFlags]]); skips the signature
    * estimate (no `sigs` join) — flags need the verdict, not the
    * sketch diagnostics. */
  def rawMatches(docs: DataFrame, idx: Index): DataFrame =
    verified(docs, idx)
      .select(col("s_doc"), col("c_doc"),
        round(col("jaccard"), 4).as("jaccard"))
      .dropDuplicates("s_doc", "c_doc")

  def outputMode: OutputMode = OutputMode.Append()
}
