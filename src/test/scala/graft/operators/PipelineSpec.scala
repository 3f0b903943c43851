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
}
