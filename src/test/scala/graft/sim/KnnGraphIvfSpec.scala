package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF-cell graph's structural contract: edges only within a
  * quantizer cell, no self-edges, per-vector rank dense in [1, K], and
  * every edge's cosine equals the exact cosine of its endpoints
  * (no approximation enters the EDGE VALUES — the approximation is
  * which candidates were considered). Recall vs brute force is
  * measured, not asserted (RecallProbe; data-density dependent). */
class KnnGraphIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cell closure, rank shape, exact edge cosines") {
    val g = KnnGraphIvf.knnGraphIvf(spark, sf).cache()
    try {
      assert(g.filter(col("a_id") === col("b_id")).count() == 0)
      // ranks dense from 1, capped at K
      val byA = g.groupBy("a_id")
        .agg(count(lit(1)).as("deg"), max("rk").as("mx"),
          min("rk").as("mn"))
      assert(byA.filter(col("mn") =!= 1 || col("mx") =!= col("deg") ||
        col("deg") > SimilarityQueries.KnnK).count() == 0,
        "rank not dense 1..deg<=K")

      // cell closure against the shared quantizer
      val (assigned, _) = Ivf.assignments(spark, sf)
      val cells = assigned.select(col("vec_id"), col("cell"))
      val crossCell = g
        .join(cells.withColumnRenamed("vec_id", "a_id")
          .withColumnRenamed("cell", "ca"), "a_id")
        .join(cells.withColumnRenamed("vec_id", "b_id")
          .withColumnRenamed("cell", "cb"), "b_id")
        .filter(col("ca") =!= col("cb"))
      assert(crossCell.count() == 0, "edge crosses a cell boundary")

      // edge cosines are the exact pairwise cosines
      import SimilarityQueries.dot
      val e = graft.Tables(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      val exact = g.select("a_id", "b_id", "cosine")
        .join(e.select(col("vec_id").as("a_id"),
          col("embedding").as("ea"), col("nrm").as("na")), "a_id")
        .join(e.select(col("vec_id").as("b_id"),
          col("embedding").as("eb"), col("nrm").as("nb")), "b_id")
        .withColumn("want",
          round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      assert(exact.filter(col("cosine") =!= col("want")).count() == 0,
        "edge cosine differs from the exact pairwise cosine")
    } finally g.unpersist()
  }
}
