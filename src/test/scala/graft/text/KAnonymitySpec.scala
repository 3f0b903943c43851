package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity contract: classes partition the corpus, the risk flag
  * is exactly `size < K`, and a planted singleton class is flagged. */
class KAnonymitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("classes partition the corpus; flag is size < K") {
    val rows = KAnonymity.kAnonymity(spark, dir).collect()
    val total = graft.Tables(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("class_size")).sum == total,
      "classes must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") ==
        (r.getAs[Long]("class_size") < KAnonymity.KAnon))
    }
    // both flag values must occur on the fixture or the gate is trivial
    assert(rows.exists(_.getAs[Boolean]("at_risk")) &&
      rows.exists(!_.getAs[Boolean]("at_risk")),
      "fixture must carry both at-risk and safe classes")
  }

  test("coarsening monotonicity: wider buckets can only merge classes") {
    // the same corpus bucketed at 1-char granularity has at least as
    // many classes (and so at least as much risk) as the gate's
    // LenBucket — the direction a release review coarsens toward
    val fine = graft.Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source"), length(col("text")).as("b"))
      .count().count()
    val coarse = KAnonymity.kAnonymity(spark, dir).count()
    assert(coarse <= fine, "coarsening must not split classes")
  }
}
