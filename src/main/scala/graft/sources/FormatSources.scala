package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Format-agnostic corpus ingestion — a pretraining pipeline receives the
  * same logical table as Parquet, ORC or JSONL (newline-delimited JSON,
  * the lingua franca of public LLM data dumps: Common Crawl derivatives,
  * The Pile, RedPajama all ship it) and every downstream operator must see
  * identical bytes. These gates prove it: the `documents` table is
  * converted ONCE per source stamp into the target format (a memoized
  * on-disk cache, like a landing zone), read back through Spark's native
  * ORC / JSON readers with an EXPLICIT schema (inference is a scale
  * anti-pattern: it scans the corpus twice and can flip types between
  * drops), and rolled up per source with an order-independent `bit_xor`
  * text checksum — any re-encoding corruption (a JSONL escape bug, an ORC
  * string truncation) flips the checksum and the oracle compare goes red.
  *
  * The oracle runs the SAME rollup over the original Parquet: green means
  * the format round-trip is byte-exact, not merely row-count-preserving.
  *
  * Scale shape at 100 TB: conversion is a one-time embarrassingly
  * parallel rewrite (no shuffle — `spark.read.format(a).write.format(b)`
  * preserves partitioning); the rollup is one map-side-combined groupBy
  * on `source`. The `bit_xor` fold is the scale-safe checksum choice —
  * XOR never overflows and commutes, where a `sum` of 32-bit hashes
  * exceeds int64 near 2³² documents.
  */
object FormatSources {

  /** Explicit read schema — the published contract of the documents
    * table; both converted readers bind it instead of inferring. */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  // conversion cache under target/ keyed by (dir-digest, source stamp):
  // re-used across sessions and bench runs, invalidated by data rewrite.
  // The digest is a sha-256 prefix of the ABSOLUTE path (round-6
  // ADVICE: 32-bit String.hashCode collisions could serve one corpus'
  // conversions for another, and dropCache would delete across the
  // collision) — 64 bits of collision resistance and canonical-path
  // keying, so "dir" and "./dir" share one entry.
  private def dirDigest(dir: String): String = {
    val abs = Paths.get(dir).toAbsolutePath.normalize.toString
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  private def cacheDir(dir: String, fmt: String): String = {
    val stamp = Tables.sourceStamp(dir, "documents")
    s"target/fmtcache/documents-${dirDigest(dir)}-$stamp.$fmt"
  }

  private def converted(s: SparkSession, dir: String, fmt: String): DataFrame =
    synchronized {
      val path = cacheDir(dir, fmt)
      if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
        val w = Tables.parallel(s, dir, "documents").write.mode("overwrite")
        fmt match {
          case "orc" => w.orc(path)
          case "jsonl" => w.json(path) // Spark's json sink IS line-delimited
          case "csv" => w.option("header", true)
            // the CSV writer TRIMS cell whitespace by default — byte
            // fidelity (the checksum law) needs both sides preserved
            .option("ignoreLeadingWhiteSpace", false)
            .option("ignoreTrailingWhiteSpace", false)
            .csv(path)
        }
      }
      val r = s.read.schema(DocumentsSchema)
      fmt match {
        case "orc" => r.orc(path)
        case "jsonl" => r.json(path)
        case "csv" => r.option("header", true).csv(path)
      }
    }

  /** Delete the on-disk conversions of one corpus dir — tests clean up
    * their temp fixtures' cache entries; production landing zones are
    * retention-managed externally, not by the engine. */
  def dropCache(dir: String): Unit = synchronized {
    val dh = dirDigest(dir)
    val root = Paths.get("target/fmtcache")
    if (Files.exists(root)) {
      val listing = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .filter(_.getFileName.toString.contains(s"-$dh-")).toSeq
          .foreach { p =>
            Files.walk(p).iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists(_))
          }
      } finally listing.close()
    }
  }

  /** Per-source rollup with an order-independent byte-exactness checksum;
    * identical SELECT over whichever physical format backs `docs`. */
  private def rollup(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"),
        expr("bit_xor(cast(conv(substring(sha2(text, 256), 1, 8), 16, 10) AS BIGINT))")
          .as("text_checksum"))

  def sourceOrc(s: SparkSession, dir: String): DataFrame =
    rollup(converted(s, dir, "orc"))

  def sourceJsonl(s: SparkSession, dir: String): DataFrame =
    rollup(converted(s, dir, "jsonl"))

  /** CSV round-trip parity (header + explicit schema on read; document
    * text is tokenized words — no delimiter/quote/newline collisions,
    * and the checksum would catch any quoting corruption byte-for-byte). */
  def sourceCsv(s: SparkSession, dir: String): DataFrame =
    rollup(converted(s, dir, "csv"))

  private val rollupSql =
    """SELECT source, count(*) AS n_docs,
      |  sum(n_chars::BIGINT)::BIGINT AS sum_chars,
      |  count(DISTINCT lang) AS n_langs,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id,
      |  bit_xor(('0x' || substr(sha256(text), 1, 8))::BIGINT)::BIGINT
      |    AS text_checksum
      |FROM documents GROUP BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_orc" -> sourceOrc,
    "source_jsonl" -> sourceJsonl,
    "source_csv" -> sourceCsv)

  // both oracles read the ORIGINAL parquet: green = converted bytes match
  val oracles: Map[String, String] = Map(
    "source_orc" -> rollupSql,
    "source_jsonl" -> rollupSql,
    "source_csv" -> rollupSql)
}
