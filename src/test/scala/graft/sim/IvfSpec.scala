package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** IVF recall check: probing 4 of 16 cells must recover most of the exact
  * top-5 (random 64-dim embeddings cluster weakly, so demand presence (>= 1)
  * rather than perfection; structure is asserted tightly). */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("ivf top-k probes few cells and overlaps the exact top-k") {
    val ivf = Ivf.ivfTopk(spark, sf).collect()
    assert(ivf.length == Ivf.TopK)
    // descending cosine, unique ids, bounded probe set
    val cosines = ivf.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-_)))
    assert(ivf.map(_.getAs[Long]("vec_id")).distinct.length == Ivf.TopK)
    assert(ivf.map(_.getAs[Int]("cell")).distinct.length <= Ivf.NProbe)

    val exact = SimilarityQueries.annCosineTopk(spark, sf)
      .limit(Ivf.TopK).collect().map(_.getAs[Long]("vec_id")).toSet
    // uniform random vectors are IVF's worst case: recall is bounded near
    // nprobe/NLists. The pipeline is fully seeded (sampled training set,
    // fixed k-means seed), so pin the exact deterministic overlap — any
    // probe-selection regression changes it.
    val overlap = ivf.map(_.getAs[Long]("vec_id")).count(exact.contains)
    assert(overlap == 3, s"deterministic recall changed: $overlap/5")
  }

  test("recall is monotone in nprobe, reaching 1.0 at probe-all") {
    val sweep = Ivf.recallSweep(spark, sf, Seq(1, 2, 4, 8, Ivf.NLists))
    val recalls = sweep.map(_._2)
    val scanned = sweep.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: $sweep")
    assert(recalls.last == 1.0, "probe-all must recall the exact top-k")
    assert(scanned.zip(scanned.tail).forall { case (a, b) => a <= b } &&
      scanned.last == 1.0,
      s"scanned fraction not monotone to 1.0: $sweep")
    info(sweep.map { case (np, r, sc) => f"nprobe=$np r=$r%.1f sc=$sc%.3f" }
      .mkString("; "))
  }

  test("probing every cell reproduces the exact top-k (correctness bound)") {
    val all = Ivf.ivfTopkProbing(spark, sf, Ivf.NLists).collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    val exact = SimilarityQueries.annCosineTopk(spark, sf)
      .limit(Ivf.TopK).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(all == exact,
      s"nprobe=NLists must equal brute force: $all vs $exact")
  }

  test("silhouette: every cell reported, bounded values, counts sum up") {
    val rows = Ivf.ivfSilhouette(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet == (0 until Ivf.NLists).toSet,
      "a trained cell is missing from the silhouette report")
    rows.foreach { case (cell, n, s) =>
      assert(n >= 1)
      assert(s >= -1.0 && s <= 1.0, s"cell $cell silhouette $s out of range")
    }
    val corpus = graft.Tables(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == corpus,
      "per-cell counts do not partition the corpus")
    // every vector sits closest to ITS centroid (argmin assignment), so
    // d_next >= d_own and the simplified silhouette is never negative
    assert(rows.forall(_._3 >= 0.0),
      "negative mean silhouette under argmin assignment")
  }
}
