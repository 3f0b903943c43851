package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The drift monitor's anchor is an independent plain-Scala
  * re-derivation: fixed-point centroid sums, cosine from integer sum
  * vectors, mean norms from integer norm sums — every output row must
  * match bit-for-bit (proving the distributed integer aggregation is
  * truly order-free). Plus shape invariants robust to a testdata regen:
  * one row per label, counts partition the corpus, cosines in [-1, 1]. */
class EmbeddingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("query rows equal the plain-Scala re-derivation") {
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Spark's round() is HALF_UP away from zero; math.round is half
    // toward +inf — they differ on negative ties, so mirror Spark.
    def rnd(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = vecs.groupBy(_._2).map { case (label, rows) =>
      val halves = rows.groupBy(v => (v._1 % 2).toInt)
      def sums(h: Int): (Array[Long], Long, Long) = {
        val vs = halves(h)
        val cs = Array.fill[Long](vs.head._3.length)(0L)
        var nrm = 0L
        vs.foreach { case (_, _, emb) =>
          val d = emb.map(_.toDouble)
          d.indices.foreach(i =>
            cs(i) += rnd(d(i) * EmbeddingDrift.Q))
          var dd = 0.0
          d.foreach(x => dd += x * x)
          nrm += rnd(math.sqrt(dd) * EmbeddingDrift.Q)
        }
        (cs, vs.size.toLong, nrm)
      }
      val (c0, n0, s0) = sums(0)
      val (c1, n1, s1) = sums(1)
      def dot(a: Array[Long], b: Array[Long]): Double = {
        var s = 0.0
        a.indices.foreach(i => s += a(i).toDouble * b(i).toDouble)
        s
      }
      (label, n0, n1,
        r4(dot(c0, c1) / (math.sqrt(dot(c0, c0)) * math.sqrt(dot(c1, c1)))),
        r4(s0.toDouble / (n0 * EmbeddingDrift.Q).toDouble),
        r4(s1.toDouble / (n1 * EmbeddingDrift.Q).toDouble))
    }.toSet
    val got = EmbeddingDrift.embeddingDrift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"drift: query-only=${got -- expected}, derived-only=${expected -- got}")
  }

  test("one row per label; counts partition; cosine bounded") {
    val total = graft.Tables(spark, sf, "embeddings").count()
    val rows = EmbeddingDrift.embeddingDrift(spark, sf).collect()
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
      assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
    }
  }
}
