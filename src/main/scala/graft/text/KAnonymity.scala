package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-anonymity over quasi-identifiers (Sweeney 2002, "k-Anonymity: a
  * model for protecting privacy") — the governance readout the PII
  * family cannot give: [[TextQueries.piiScan]] finds explicit
  * identifiers (emails, phones); re-identification risk also lives in
  * COMBINATIONS of innocuous attributes. A document whose
  * quasi-identifier tuple is shared by fewer than K documents is
  * re-identifiable by linkage; the release rule is "every equivalence
  * class ≥ K".
  *
  * Quasi-identifier here: (lang, source, length decile) — the
  * attributes this corpus would publish alongside text. The gate emits
  * every equivalence class with its size and the `at_risk` flag
  * (size < [[KAnon]]), plus the risk MASS (how many documents sit in
  * sub-K classes) per class — the number a release review reads first.
  *
  * Scale: one corpus scan into a (lang × source × decile)-keyed count —
  * map-side partials, shuffle ∝ distinct classes (domain-bounded), the
  * doc-profile family shape. At 100 TB the class domain is unchanged;
  * only partials scale. */
object KAnonymity {

  /** Release threshold (k = 5, the classic working value). */
  val KAnon = 5

  /** Length-decile width in characters — the coarsened numeric
    * attribute (coarsening is HOW k-anonymity is achieved; the gate
    * audits the chosen coarsening). */
  val LenBucket = 100

  /** Gate: every quasi-identifier equivalence class with size and risk
    * flag. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents")
      .select(col("lang"), col("source"),
        expr(s"length(text) div $LenBucket").as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("class_size"))
      .select(col("lang"), col("source"), col("len_bucket"),
        col("class_size"),
        (col("class_size") < KAnon).as("at_risk"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_anonymity" -> kAnonymity)

  def oracles: Map[String, String] = Map(
    "k_anonymity" ->
      s"""SELECT lang, source,
        |  (length(text) // $LenBucket)::BIGINT AS len_bucket,
        |  count(*)::BIGINT AS class_size,
        |  count(*) < $KAnon AS at_risk
        |FROM documents
        |GROUP BY 1, 2, 3""".stripMargin)
}
