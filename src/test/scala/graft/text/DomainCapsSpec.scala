package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The threshold-select cap must be indistinguishable from the naive
  * global per-source sort it replaces: exactly min(N, |source|) docs per
  * source, and exactly the top-N set under (score desc, doc_id asc). */
class DomainCapsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("kept set equals the naive top-N by (score desc, doc_id)") {
    val kept = DomainCaps.domainCaps(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getString(3)))
    val all = QuantileNorm.scored(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(kept.nonEmpty)
    val bySource = all.groupBy(_._1)
    for ((src, docs) <- bySource) {
      val naive = docs.sortBy(d => (-d._3, d._2)).take(DomainCaps.CapN)
      val got = kept.filter(_._1 == src)
      assert(got.length == math.min(DomainCaps.CapN, docs.length),
        s"$src kept ${got.length}")
      assert(got.map(g => (g._2, g._3)).toSet ==
        naive.map(d => (d._2, d._3)).toSet, s"$src set drift")
      // keep_via marks the threshold slice and nothing else
      val t = naive.map(_._3).min
      for (g <- got)
        assert(g._4 == (if (g._3 > t) "above_cap_threshold" else "tie_break"))
    }
  }

  test("no doc appears twice and every kept doc exists in the corpus") {
    val kept = DomainCaps.domainCaps(spark, sf).collect().map(_.getLong(0))
    assert(kept.distinct.length == kept.length)
    val ids = QuantileNorm.scored(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(kept.forall(ids))
  }
}
