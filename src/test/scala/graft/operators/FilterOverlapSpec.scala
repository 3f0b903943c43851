package graft.operators

import graft.SparkTestSession
import graft.dedup.{ConnectedComponents, DedupQueries}
import graft.text.TextQueries
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The overlap matrix must agree with its component relations (no
  * drift from parts — the dataset_card law) and satisfy the set
  * algebra: n_both ≤ min(n_a, n_b), exact/near tiers disjoint by
  * construction, full C(4,2) coverage including zero axes. */
class FilterOverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sets(): Map[String, Set[Long]] = {
    val (ex, near) = ConnectedComponents.removalTiers(spark, sf)
    val all = graft.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pass = TextQueries.gopherFlags(graft.Tables(spark, sf, "documents"))
      .filter(col("pass")).select("doc_id").collect().map(_.getLong(0)).toSet
    Map(
      "exact_dup" -> ex.collect().map(_.getLong(0)).toSet,
      "near_dup" -> near.collect().map(_.getLong(0)).toSet,
      "gopher_fail" -> (all -- pass),
      "contaminated" -> DedupQueries.decontaminate(spark, sf)
        .select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("matrix equals the component-set replay") {
    val ss = sets()
    val names = FilterOverlap.FilterNames.sorted
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      (a, b) = (names(i), names(j))
      both = (ss(a) intersect ss(b)).size.toLong
      na = ss(a).size.toLong; nb = ss(b).size.toLong
      u = na + nb - both
      jac = if (u > 0) BigDecimal(both.toDouble / u)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
    } yield (a, b, na, nb, both, jac)).toSet
    val got = FilterOverlap.filterOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == want)
    assert(got.size == 6)
  }

  test("set algebra: both bounded, dedup tiers disjoint") {
    val ss = sets()
    assert((ss("exact_dup") intersect ss("near_dup")).isEmpty)
    for (r <- FilterOverlap.filterOverlap(spark, sf).collect())
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
  }
}
