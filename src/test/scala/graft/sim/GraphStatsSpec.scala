package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Mutual-kNN graph structure on a planted corpus: a 4-clique of identical
  * vectors yields degree 3 / 3 triangles / clustering 1.0 per member, an
  * antipodal singleton lands in another bucket with degree 0, and the
  * degree histogram accounts for every vector. */
class GraphStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withFixture[T](f: String => T): T = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gstats")
    try {
      val base = Array.fill(64)(1.0f)
      val anti = base.map(-_)
      // four near-identical vectors (tiny id-dependent jitter keeps
      // cosines distinct but ~1) + one antipodal singleton
      val rows = (0L to 3L).map { i =>
        (i, base.zipWithIndex.map { case (x, j) =>
          x + (if (j == i.toInt) 0.001f * (i + 1) else 0f)
        }.toSeq, 0)
      } :+ ((4L, anti.toSeq, 1))
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      f(dir.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("4-clique: degree 3, 3 triangles, clustering 1.0 each") {
    withFixture { dir =>
      val stats = GraphStats.triangleStats(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(stats.keySet == Set(0L, 1L, 2L, 3L), s"nodes: ${stats.keySet}")
      stats.values.foreach { case (deg, tri, cc) =>
        assert(deg == 3L && tri == 3L && cc == 1.0, s"got ($deg,$tri,$cc)")
      }
    }
  }

  test("degree histogram accounts for every vector incl. isolates") {
    withFixture { dir =>
      val hist = GraphStats.degreeHist(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hist == Map(3L -> 4L, 0L -> 1L), s"hist: $hist")
    }
  }

  test("mutual edges are symmetric-closed and u < v") {
    withFixture { dir =>
      val e = GraphStats.mutualEdges(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(e.forall { case (u, v) => u < v })
      assert(e.toSet.size == 6, s"edges: ${e.toSeq}") // C(4,2)
    }
  }
}
