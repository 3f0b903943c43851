package graft.functions

import graft.SparkTestSession
import graft.text.TextQueries.{hex32, trigrams, words}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV overlap estimator's anchors: (1) every row is re-derived
  * independently in plain Scala from the exact per-source hash sets —
  * the aggregator, the array pipeline and the estimator arithmetic must
  * reproduce it bit-for-bit; (2) union estimates land within 4·rsd of
  * the exact union (rsd ≈ 1/√(K−2) ≈ 12.7 % — deterministic for fixed
  * data; a testdata regen can legitimately move a pair, in which case
  * the bound, not the code, is what to revisit); (3) the pair relation
  * is the full unordered source×source set. */
class SourceOverlapKmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def hashSets(): Map[String, Vector[Long]] = {
    val rows = graft.Tables(spark, sf, "documents")
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("source"), explode(trigrams(col("w"))).as("sg"))
      .select(col("source"), hex32(col("sg")).as("h"))
      .distinct().collect()
    rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toVector.distinct.sorted).toMap
  }

  test("query rows equal the plain-Scala re-derivation") {
    val sets = hashSets()
    val k = Kmv.K
    val expected = (for {
      (sa, ha) <- sets; (sb, hb) <- sets if sa < sb
    } yield {
      val ska = ha.take(k)
      val skb = hb.take(k)
      val u = (ska ++ skb).distinct.sorted.take(k)
      val inBoth = u.count(h => ska.contains(h) && skb.contains(h))
      val estUnion =
        if (u.size < k) u.size.toDouble
        else (k - 1) * Kmv.HashRange / u.last
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (sa, sb, r4(estUnion), r4(inBoth.toDouble / u.size),
        r4(inBoth.toDouble / u.size * estUnion))
    }).toSet
    val got = Kmv.sourceOverlapKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"drift: query-only=${got -- expected}, derived-only=${expected -- got}")
  }

  test("union estimate within 4·rsd of exact; full pair relation") {
    val sets = hashSets()
    val rows = Kmv.sourceOverlapKmv(spark, sf).collect()
    val n = sets.size
    assert(rows.length == n * (n - 1) / 2, "missing source pairs")
    val rsd = 1.0 / math.sqrt(Kmv.K - 2)
    rows.foreach { r =>
      val exact = (sets(r.getString(0)) ++ sets(r.getString(1)))
        .distinct.size.toDouble
      val est = r.getDouble(2)
      assert(math.abs(est - exact) <= 4 * rsd * exact,
        s"${r.getString(0)}×${r.getString(1)}: est $est vs exact $exact")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) <= est + 1e-9, "shared above union")
    }
  }
}
