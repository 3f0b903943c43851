package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The occupancy dials: plane/cell counts must grow with the corpus so
  * bucket (and cell) occupancy stays pinned, while the gate's fixture
  * constants stay the floor — and the dialed paths must be the SAME
  * computation, just wider. */
class OccupancyDialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planesFor: fixture floor, +1 per corpus doubling, capped") {
    assert(SimilarityQueries.planesFor(0) == SimilarityQueries.NumPlanes)
    assert(SimilarityQueries.planesFor(500) == SimilarityQueries.NumPlanes)
    // target occupancy 8: 5000/8=625 → 10 planes; ×2 corpus → +1 plane
    assert(SimilarityQueries.planesFor(5000) == 10)
    assert(SimilarityQueries.planesFor(10000) == 11)
    assert(SimilarityQueries.planesFor(50000) == 13)
    assert(SimilarityQueries.planesFor(150000) == 15)
    assert(SimilarityQueries.planesFor(Long.MaxValue) == 30) // cap
    // monotone non-decreasing over a sweep
    val sweep = Seq(1L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(SimilarityQueries.planesFor(_))
    assert(sweep == sweep.sorted)
  }

  test("nListsFor: fixture floor, cells ∝ corpus / target") {
    assert(Ivf.nListsFor(0) == Ivf.NLists)
    assert(Ivf.nListsFor(500) == Ivf.NLists) // 5 cells needed < 16 floor
    assert(Ivf.nListsFor(5000) == 50)
    assert(Ivf.nListsFor(50000) == 500)
    assert(Ivf.nListsFor(150000) == 1500)
  }

  test("gate knn graph IS the dialed graph at the fixture constant") {
    val dir = "/root/testdata/sf0.001"
    val gate = SimilarityQueries.knnGraphLsh(spark, dir)
    val dialed = SimilarityQueries
      .knnGraphLsh(spark, dir, SimilarityQueries.NumPlanes)
    // digest normalizes per-run expression IDs away; same digest = same plan
    assert(graft.plans.PlanDigest.digestOf(gate) ==
      graft.plans.PlanDigest.digestOf(dialed))
  }

  test("ML-transform assignment agrees with the literal argmin path") {
    val dir = "/root/testdata/sf0.001"
    val (literal, _) = Ivf.assignments(spark, dir)
    val ml = Ivf.assignmentsMl(spark, dir, Ivf.NLists)
    val joined = literal.select(col("vec_id"), col("cell").as("c_lit"))
      .join(ml.select(col("vec_id"), col("cell").as("c_ml")), "vec_id")
    val n = joined.count()
    val agree = joined.filter(col("c_lit") === col("c_ml")).count()
    // both compute nearest-centroid/lowest-index; BLAS vs literal double
    // arithmetic may flip exact ties, so the bound is derived, not exact
    assert(n > 0 && agree.toDouble / n >= 0.95,
      s"only $agree/$n assignments agree between ML and literal paths")
  }

  test("more planes never increase max bucket occupancy (refinement)") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.parallel(spark, dir, "embeddings")
    def maxOcc(planes: Int): Long = e
      .select(SimilarityQueries.lshBucket(col("embedding"), 64, planes)
        .as("bucket"))
      .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    // wider bucket ids REFINE narrower ones (prefix property): every
    // P+1-plane bucket is a subset of a P-plane bucket, so max occupancy
    // is non-increasing in the plane count for ANY data.
    val occs = Seq(4, 8, 10, 12).map(maxOcc)
    assert(occs == occs.sorted.reverse, s"occupancies not monotone: $occs")
  }
}
