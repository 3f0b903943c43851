package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII redaction — the transformation half of the hygiene pass
  * (`pii_scan` is the detection half): email-shaped tokens, URLs and
  * long digit runs are replaced with typed placeholders before text
  * ships to training (the C4/RefinedWeb discipline). Pure per-row
  * `regexp_replace` chain: zero shuffle at any scale.
  *
  * The fixture corpus is deliberately PII-free, so the gate would
  * otherwise be a no-op; instead the query APPENDS deterministic
  * synthetic PII derived from `doc_id` (both engines build the
  * byte-identical string), redacts it, and emits a sha256 prefix of the
  * redacted text — the oracle replays the augmentation + redaction in
  * DuckDB, so a single byte of divergence (a regex dialect difference,
  * a replacement-order bug) reds the hash. Digit runs shorter than 6
  * survive by design (doc_id² crosses the 6-digit bar only for
  * doc_id ≥ 317), so both redacted and untouched populations exist.
  *
  * Replacement order matters and is part of the contract: emails first
  * (their local parts contain digits), then URLs, then bare digit runs.
  */
object PiiRedact {

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val DigitsRe = "[0-9]{6,}"

  private def augmented: Column =
    concat(col("text"),
      lit(" contact u"), col("doc_id"), lit("@mail.example.com"),
      lit(" via https://site"), col("doc_id"), lit(".example/path"),
      lit(" ref "), col("doc_id") * col("doc_id"))

  def piiRedact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("aug", augmented)
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
          EmailRe, "<EMAIL>"), UrlRe, "<URL>"), DigitsRe, "<NUM>"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(UrlRe), lit(0)))
          .cast("long").as("n_urls"),
        size(regexp_extract_all(col("aug"), lit(DigitsRe), lit(0)))
          .cast("long").as("n_digit_runs"),
        (length(col("aug")) - length(col("redacted"))).cast("long")
          .as("len_delta"),
        substring(sha2(col("redacted"), 256), 1, 16).as("redacted_sha"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_redact" -> piiRedact)

  val oracles: Map[String, String] = Map(
    "pii_redact" ->
      s"""WITH a AS (SELECT doc_id,
        |    text || ' contact u' || doc_id || '@mail.example.com'
        |         || ' via https://site' || doc_id || '.example/path'
        |         || ' ref ' || (doc_id * doc_id) AS aug
        |  FROM documents),
        |r AS (SELECT doc_id, aug,
        |    regexp_replace(regexp_replace(regexp_replace(aug,
        |      '$EmailRe', '<EMAIL>', 'g'),
        |      '$UrlRe', '<URL>', 'g'),
        |      '$DigitsRe', '<NUM>', 'g') AS redacted
        |  FROM a)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '$EmailRe'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(aug, '$UrlRe'))::BIGINT AS n_urls,
        |  len(regexp_extract_all(aug, '$DigitsRe'))::BIGINT AS n_digit_runs,
        |  (length(aug) - length(redacted))::BIGINT AS len_delta,
        |  substr(sha256(redacted), 1, 16) AS redacted_sha
        |FROM r""".stripMargin)
}
