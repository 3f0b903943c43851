package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import graft.storm.StormQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond the reference's CSV/JSON (parquet is
  * the gate's native format): every enriched row must round-trip losslessly
  * through parquet, ORC, line-delimited JSON and header CSV. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val enriched = StormQueries
    .stormEnrich(spark, "/root/testdata/sf0.001")
    .cache()

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"fmt_$fmt").toString + "/out"
    val writer = enriched.write.mode("overwrite")
    val w2 = if (fmt == "csv") writer.option("header", "true") else writer
    w2.format(fmt).save(dir)
    val reader = spark.read
    val r2 =
      if (fmt == "parquet" || fmt == "orc") reader
      else reader.option("header", "true").schema(enriched.schema)
    val back = r2.format(fmt).load(dir)
      .select(enriched.columns.map(col): _*) // json infers alphabetical order
    // csv conflates null and "" on write; normalize both to one sentinel
    val norm: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.select(df.columns.map(c =>
        when(col(c).isNull || col(c).cast("string") === "", "∅")
          .otherwise(col(c).cast("string")).as(c)): _*)
    val a = norm(enriched).exceptAll(norm(back)).count()
    val b = norm(back).exceptAll(norm(enriched)).count()
    assert(a == 0 && b == 0, s"$fmt round-trip lost rows: $a/$b")
    assert(back.count() == enriched.count())
  }

  test("parquet round-trip is lossless")(roundTrip("parquet"))
  test("orc round-trip is lossless")(roundTrip("orc"))

  test("orc scans get predicate pushdown like parquet") {
    val dir = Files.createTempDirectory("orc_push").toString + "/out"
    enriched.write.mode("overwrite").format("orc").save(dir)
    val plan = spark.read.format("orc").load(dir)
      .filter(col("severity") === "severe")
      .select("id", "severity")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:") && plan.contains("severity"),
      s"severity filter not pushed to the ORC scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("magnitude"), "ORC scan reads pruned columns")
  }
  test("json (line-delimited) round-trip is lossless")(roundTrip("json"))
  test("csv round-trip is lossless up to null/empty conflation")(roundTrip("csv"))
}
