package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster/pair consistency at sf0.01 (the smallest SF whose fixture
  * plants verified embedding near-dup pairs): both endpoints of every
  * verified pair land in the same cluster, cluster ids are the min
  * member, member counts partition the endpoint set, and every
  * clustered vector actually appears in some pair. */
class SemanticClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("clusters are consistent with the verified pair relation") {
    val pairs = SimilarityQueries.dedupEmbeddingCosine(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.01 fixture must plant embedding near-dups")

    val clusters = KnnGraphIvf.semanticClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // reference union-find over the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq
    val expected = members.groupBy(find)
      .map { case (_, ms) => (ms.min, ms.size.toLong, ms.max) }.toSet
    assert(clusters.toSet == expected,
      s"cluster drift: got=${clusters.toSet}, want=$expected")
  }
}
