package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kNN-graph invariants: per-vector degree capped at K with dense ranks,
  * every edge stays inside its LSH bucket, and the graph is
  * deterministic under repartitioning (the tie-break is total). */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("degrees capped, ranks dense, edges within buckets, deterministic") {
    val g = SimilarityQueries.knnGraphLsh(spark, sf).cache()
    assert(g.count() > 0)

    // degree <= K and ranks are exactly 1..degree per vector
    val byA = g.groupBy("a_id")
      .agg(count(lit(1)).as("deg"), max("rk").as("maxrk"), min("rk").as("minrk"))
    assert(byA.filter(col("deg") > SimilarityQueries.KnnK).count() == 0)
    assert(byA.filter(col("maxrk") =!= col("deg") || col("minrk") =!= 1)
      .count() == 0)

    // every edge joins two vectors of the SAME bucket
    val buckets = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), SimilarityQueries.lshBucket(
        col("embedding"), 64).as("bucket"))
    val cross = g
      .join(buckets.withColumnRenamed("vec_id", "a_id")
        .withColumnRenamed("bucket", "ba"), "a_id")
      .join(buckets.withColumnRenamed("vec_id", "b_id")
        .withColumnRenamed("bucket", "bb"), "b_id")
      .filter(col("ba") =!= col("bb"))
    assert(cross.count() == 0)

    // no self-edges
    assert(g.filter(col("a_id") === col("b_id")).count() == 0)
    g.unpersist()
  }
}
