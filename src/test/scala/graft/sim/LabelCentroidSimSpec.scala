package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Centroid-similarity matrix laws: symmetric input ⇒ full upper
  * triangle, planted mirror labels (identical up to per-vector noise
  * well below the centroid scale) are flagged, orthogonal labels are
  * not, and the gate corpus's 10 labels are genuinely distinct. */
class LabelCentroidSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planted mirror labels are flagged; orthogonal ones are not") {
    import spark.implicits._
    // labels 0 and 1 mirror each other along e0; label 2 along e1
    def vec(axis: Int, mag: Float): Seq[Float] =
      Seq.tabulate(4)(i => if (i == axis) mag else 0.0f)
    val rows =
      (0 until 20).map(i => (0, vec(0, 1.0f + 0.001f * i))) ++
        (0 until 20).map(i => (1, vec(0, 1.0f - 0.001f * i))) ++
        (0 until 20).map(i => (2, vec(1, 1.0f)))
    val emb = rows.toDF("label", "embedding")
    val out = EmbeddingDrift.centroidSimOver(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out.size == 3, "3 labels -> full upper triangle")
    assert(out((0, 1))._1 == 1.0 && out((0, 1))._2, "mirror pair flagged")
    assert(out((0, 2))._1 == 0.0 && !out((0, 2))._2)
    assert(out((1, 2))._1 == 0.0 && !out((1, 2))._2)
  }

  test("gate corpus: full triangle, no false mirrors") {
    val rows = EmbeddingDrift
      .labelCentroidSim(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 45, "C(10,2) pairs")
    assert(rows.forall(!_.getBoolean(5)),
      "fixture labels are distinct clusters")
    assert(rows.forall(r => math.abs(r.getDouble(4)) <= 1.0))
  }
}
