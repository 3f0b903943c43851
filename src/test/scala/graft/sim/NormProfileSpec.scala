package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the norm histogram with the same left-to-right
  * double dot + IEEE sqrt, plus vector conservation. */
class NormProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("histogram equals the driver replay") {
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.get(0), r.getSeq[Float](1).toArray))
    val want = vecs.map { case (l, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      (l, BigDecimal(math.sqrt(s))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.groupBy(identity).map { case ((l, b), xs) => (l, b, xs.length.toLong) }
      .toSet
    val got = NormProfile.embedNormProfile(spark, sf).collect()
      .map(r => (r.get(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("vector conservation") {
    val total = NormProfile.embedNormProfile(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(total == graft.Tables(spark, sf, "embeddings").count())
  }
}
