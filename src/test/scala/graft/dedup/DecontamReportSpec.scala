package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The eval-integrity report must agree with the drop-list view it
  * summarizes: per-eval flagged-document counts and worst overlaps equal
  * a regroup of the `decontaminate` pair relation, and the contamination
  * counters are internally consistent. */
class DecontamReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("report flag counts equal a regroup of the pair relation") {
    val pairs = DedupQueries.decontaminate(spark, sf)
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_flagged"), max("n_overlap").as("max_overlap"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val report = DedupQueries.decontamReport(spark, sf).cache()
    val got = report
      .filter(col("n_flagged") > 0)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_flagged"), r.getAs[Long]("max_overlap"))).toMap
    assert(got == pairs)
    // internal consistency: hits bounded by totals, frac in [0, 1],
    // and EVERY shingled eval doc present exactly once (an empty report
    // must fail, not vacuously pass)
    assert(report.filter(col("n_hit") > col("n_grams")).count() == 0)
    assert(report.filter(col("contam_frac") < 0 || col("contam_frac") > 1)
      .count() == 0)
    val expectedEvalDocs = DedupQueries.shingles(spark, sf)
      .filter(col("doc_id") < DedupQueries.DecontamEvalDocs)
      .select("doc_id").distinct().count()
    assert(expectedEvalDocs > 0)
    assert(report.count() == expectedEvalDocs)
    assert(report.select("eval_id").distinct().count() == expectedEvalDocs)
    report.unpersist()
  }
}
