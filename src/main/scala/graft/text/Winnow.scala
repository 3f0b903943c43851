package graft.text

import graft.Tables
import graft.text.TextQueries.{hex32, trigrams, trigramsSql, words}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003) —
  * the selection rule behind exact-substring / clone detection at corpus
  * scale: slide a window of [[WinnowWindow]] consecutive shingle hashes
  * and keep each window's minimum. Guarantees: any shared run of
  * WinnowWindow+2 shingles produces at least one IDENTICAL selected
  * fingerprint in both documents, while only ~2/(w+1) of positions are
  * kept — the density/recall trade dense fingerprinting
  * ([[TextQueries]] doc_fingerprint) can't make.
  *
  * Ties are impossible by construction: the windowed min runs over
  * `hash · 2²⁰ + position`, unique per document, so selection is fully
  * deterministic and the DuckDB oracle reproduces it with the same
  * integer arithmetic. One shuffle by doc_id for the window; the rest is
  * per-row — linear at 100 TB. The gate row compresses each document's
  * fingerprint SET to (count, hash-sum) scalars; a dedup consumer would
  * instead join the exploded set with itself shuffled by fingerprint. */
object Winnow {

  /** Window width w: ~2/(w+1) ≈ 22 % of shingles selected. */
  val WinnowWindow = 8

  def winnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.parallel(s, dir, "documents")
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), posexplode(trigrams(col("w"))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        (hex32(col("col")) * lit(1048576L) + col("pos") + 1).as("key"))
    val perDoc = Window.partitionBy("doc_id")
    val ahead = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, WinnowWindow - 1)
    g.withColumn("n", count(lit(1)).over(perDoc))
      .withColumn("mk", min("key").over(ahead))
      .filter(col("pos") <= col("n") - WinnowWindow + 1) // full windows only
      .select(col("doc_id"), col("n"), col("mk")).distinct()
      .groupBy("doc_id")
      .agg(max("n").cast("long").as("n_grams"),
        count(lit(1)).as("n_fp"),
        sum(shiftright(col("mk"), 20)).cast("long").as("fp_checksum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "winnow_fingerprints" -> winnowFingerprints)

  val oracles: Map[String, String] = Map(
    "winnow_fingerprints" ->
      s"""WITH g AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(w) - 1)) AS pos,
        |    unnest($trigramsSql) AS sg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
        |                x -> x <> '') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |k AS (SELECT doc_id, pos,
        |        ('0x' || substr(sha256(sg), 1, 8))::BIGINT * 1048576 + pos
        |          AS key
        |      FROM g),
        |m AS (SELECT doc_id, pos,
        |        count(*) OVER (PARTITION BY doc_id) AS n,
        |        min(key) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW
        |          AND ${WinnowWindow - 1} FOLLOWING) AS mk
        |      FROM k),
        |sel AS (SELECT DISTINCT doc_id, n, mk FROM m
        |        WHERE pos <= n - $WinnowWindow + 1)
        |SELECT doc_id, max(n)::BIGINT AS n_grams, count(*) AS n_fp,
        |  sum(mk >> 20)::BIGINT AS fp_checksum
        |FROM sel GROUP BY doc_id""".stripMargin)
}
