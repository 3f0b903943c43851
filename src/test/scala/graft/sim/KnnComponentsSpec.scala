package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver union-find replay of the kNN component census plus the node
  * conservation law (Σ size·n_components = vector count, isolates
  * included as singletons). */
class KnnComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("census equals a driver union-find over the mutual edges") {
    val edges = GraphStats.mutualEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = graft.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((u, v) <- edges) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val want = nodes.groupBy(find).values.map(_.length.toLong).toSeq
      .groupBy(identity).map { case (sz, xs) => (sz, xs.size.toLong) }.toSet
    val got = GraphStats.knnComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.exists(_._1 > 1), "must carry real multi-node components")
  }

  test("node conservation") {
    val rows = GraphStats.knnComponents(spark, sf).collect()
    val total = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(total == graft.Tables(spark, sf, "embeddings").count())
  }
}
