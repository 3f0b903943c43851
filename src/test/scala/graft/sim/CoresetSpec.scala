package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver replay of the greedy farthest-point traversal with the same
  * left-to-right double arithmetic, plus the monotone-radius law (each
  * selection distance can only shrink — the 2-approximation's engine). */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("engine selection equals the driver greedy replay") {
    val emb = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def d2(v: Array[Float], c: Array[Float]): Double =
      dot(v, v) - 2.0 * dot(v, c) + dot(c, c)
    var centers = Vector((1L, emb.head._1, 0.0))
    var minD = emb.map { case (id, v) => id -> d2(v, emb.head._2) }.toMap
    val byId = emb.toMap
    for (rank <- 2 to Coreset.K) {
      val (id, d) = emb.map { case (i, _) => (i, minD(i)) }
        .maxBy { case (i, d) => (d, -i) } // d desc, id asc
      centers :+= ((rank.toLong, id, d))
      if (rank < Coreset.K)
        minD = emb.map { case (i, v) =>
          i -> math.min(minD(i), d2(v, byId(id))) }.toMap
    }
    val got = Coreset.coresetKcenter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == centers.toSet)
  }

  test("selection distances are non-increasing from rank 2 on") {
    val rows = Coreset.coresetKcenter(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == Coreset.K)
    assert(rows.map(_.getLong(0)).sameElements(1L to Coreset.K.toLong))
    val seps = rows.drop(1).map(_.getDouble(2))
    assert(seps.zip(seps.tail).forall { case (a, b) => b <= a })
    assert(seps.forall(_ > 0.0))
    assert(rows.map(_.getLong(1)).distinct.length == Coreset.K)
  }
}
