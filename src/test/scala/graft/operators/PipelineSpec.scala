package graft.operators

import graft.SparkTestSession
import graft.dedup.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** The funnel must agree with the standalone operators it composes. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pipeline_funnel tiers agree with dedup_apply and monotone shrink") {
    val f = Pipeline.pipelineFunnel(spark, sf).head()
    val (raw, tokRaw, ex, near, afterDedup, fin, tokFin) =
      (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3),
        f.getLong(4), f.getLong(5), f.getLong(6))
    val a = ConnectedComponents.dedupApply(spark, sf).head()
    assert(raw == a.getLong(0) && ex == a.getLong(1) && near == a.getLong(2))
    assert(afterDedup == a.getLong(3), "dedup survivors drifted from apply")
    assert(raw - ex - near == afterDedup)
    assert(fin <= afterDedup && fin > 0)
    assert(tokFin <= tokRaw && tokFin > 0)
  }

  test("dataset_card numbers agree with the component gate queries") {
    val c = Pipeline.datasetCard(spark, sf).head()
    val (nDocs, nTokens) = (c.getLong(0), c.getLong(1))
    assert(nDocs > 0 && nTokens > nDocs)
    // dup rate composes dedup_exact's accounting
    val d = graft.dedup.DedupQueries.dedupExact(spark, sf).head()
    assert(math.abs(c.getDouble(7) - d.getLong(2).toDouble / nDocs) < 5e-5,
      "exact_dup_rate drifted from dedup_exact")
    // pass rate composes the gopher rule set
    val nPass = graft.text.TextQueries
      .gopherFlags(graft.Tables(spark, sf, "documents"))
      .filter(org.apache.spark.sql.functions.col("pass")).count()
    assert(math.abs(c.getDouble(8) - nPass.toDouble / nDocs) < 5e-5,
      "gopher_pass_rate drifted from quality_gopher")
    // shares are sane probabilities; mean tokens consistent
    Seq(5, 6, 7, 8).foreach { i =>
      assert(c.getDouble(i) >= 0.0 && c.getDouble(i) <= 1.0, s"col $i")
    }
    assert(math.abs(c.getDouble(9) - nTokens.toDouble / nDocs) < 5e-5)
  }
}
