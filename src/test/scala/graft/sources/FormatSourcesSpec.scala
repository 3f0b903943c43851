package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Format round-trip fidelity: ORC, JSONL, and CSV conversions of a
  * corpus with hostile strings (JSON/CSV metachars, unicode,
  * leading/trailing spaces) read back row-identical, and the four
  * physical formats produce the same rollup. */
class FormatSourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixtureDir(): java.nio.file.Path = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fmt")
    val docs = Seq(
      (0L, """quote " backslash \ slash / done""", "en", "src0"),
      (1L, "unicode é中文 mixed", "zh", "src0"),
      (2L, "  leading and trailing  ", "en", "src1"),
      (3L, "plain words only", "en", "src1"),
      (4L, "comma, separated, values", "en", "src2"),
      (5L, "newline-free but; semicolons: and	tabs", "en", "src2"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rm(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("ORC and JSONL round-trip hostile strings byte-exactly") {
    val dir = fixtureDir()
    try {
      val orig = spark.read.parquet(s"$dir/documents.parquet")
        .orderBy("doc_id").collect().toSeq
      assert(orig.size == 6)
      val viaOrc = FormatSources.sourceOrc(spark, dir.toString)
        .orderBy("source").collect().toSeq
      val viaJsonl = FormatSources.sourceJsonl(spark, dir.toString)
        .orderBy("source").collect().toSeq
      val viaCsv = FormatSources.sourceCsv(spark, dir.toString)
        .orderBy("source").collect().toSeq
      val viaParquet = spark.read.parquet(s"$dir/documents.parquet")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"),
          expr("bit_xor(cast(conv(substring(sha2(text, 256), 1, 8), 16, 10) AS BIGINT))")
            .as("text_checksum"))
        .orderBy("source").collect().toSeq
      assert(viaOrc == viaParquet, "ORC rollup drifted from parquet")
      assert(viaJsonl == viaParquet, "JSONL rollup drifted from parquet")
      assert(viaCsv == viaParquet, "CSV rollup drifted from parquet")
    } finally {
      FormatSources.dropCache(dir.toString)
      rm(dir)
    }
  }

  test("checksum catches a single-character corruption") {
    val dir = fixtureDir()
    try {
      val clean = FormatSources.sourceOrc(spark, dir.toString)
        .filter(col("source") === "src1").select("text_checksum")
        .head().getLong(0)
      // corrupt one text character and rewrite (new stamp → new cache);
      // materialize first — Spark cannot overwrite a path it is reading
      import spark.implicits._
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .as[(Long, String, String, String, Long)].collect().toSeq
        .map { case r @ (id, t, l, s, n) =>
          if (id == 3L) (id, "plain words 0nly", l, s, n) else r
        }
      Thread.sleep(1100) // mtime resolution — force a distinct source stamp
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val corrupted = FormatSources.sourceOrc(spark, dir.toString)
        .filter(col("source") === "src1").select("text_checksum")
        .head().getLong(0)
      assert(clean != corrupted, "checksum must flip on corruption")
    } finally {
      FormatSources.dropCache(dir.toString)
      rm(dir)
    }
  }
}
