package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL++ gate invariants: the 3·rsd bound holds on real data (what the
  * oracle's TRUE flag asserts), and the sketch is partitioning-independent
  * — the mergeability witness that makes it safe map-side at 100 TB. */
class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("hll estimate is within 3 rsd of exact per source") {
    val r = Hll.hllDistinct(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("n_exact") <= 0).count() == 0)
    assert(r.filter(!col("ok_hll")).count() == 0)
    r.unpersist()
  }

  test("hll sketch is independent of partitioning (mergeable)") {
    import spark.implicits._
    val vals = Seq.tabulate(5000)(i => s"g$i").toDF("v")
    def est(parts: Int): Long = vals.repartition(parts)
      .agg(approx_count_distinct(col("v"), Hll.Rsd)).as[Long].head()
    assert(est(1) == est(13))
  }
}
