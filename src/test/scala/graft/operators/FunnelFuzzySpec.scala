package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sequence-match and record-linkage operators. */
class FunnelFuzzySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("funnel stages partition all active user-days and stay ordered") {
    import spark.implicits._
    val f = Funnel.funnelStages(spark, sf).cache()
    // stages within [0, 3], and a proper funnel: some group at every depth
    assert(f.filter(col("stage") < 0 || col("stage") > 3).count() == 0)
    assert(f.count() == 4) // 0..3 all populated on this corpus
    // totality: stage rows account for every (user, day) with step events
    val total = f.agg(sum("n_user_days")).as[Long].head()
    val expected = Tables(spark, sf, "events")
      .filter(col("event_type").isin(Funnel.FunnelSteps: _*))
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    assert(total == expected)
    f.unpersist()
  }

  test("fuzzy pairs are canonical, thresholded, and block-consistent") {
    // use sf0.01 — at sf0.001 blocks are singletons (empty is correct)
    val p = FuzzyJoin.fuzzyNamePairs(spark, "/root/testdata/sf0.01").cache()
    assert(p.count() > 0)
    assert(p.filter(col("a_id") >= col("b_id")).count() == 0)
    assert(p.filter(col("lev") > FuzzyJoin.MaxEditDistance ||
      col("lev") <= 0).count() == 0)
    // recompute the distance on the emitted names: must agree
    assert(p.filter(levenshtein(col("a_name"), col("b_name")) =!= col("lev"))
      .count() == 0)
    p.unpersist()
    assert(FuzzyJoin.fuzzyNamePairs(spark, sf).count() == 0)
  }
}
