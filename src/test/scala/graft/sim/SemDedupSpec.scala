package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup soundness against a driver-side re-derivation: every drop
  * must be justified by a kept-or-dropped same-cell duplicate that
  * dominates it, local maxima must survive, and the verdict must cover
  * every vector exactly once. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dp += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  test("verdicts match an independent within-cell dominance re-derivation") {
    import spark.implicits._
    val out = SemDedup.semDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cell"), r.getAs[Double]("cent_score"),
          r.getAs[Boolean]("keep"))).toMap

    val n = graft.Tables(spark, sf, "embeddings").count()
    assert(out.size.toLong == n, "one verdict per vector")
    assert(out.values.exists(_._3) && out.values.exists(!_._3),
      "threshold must populate both branches of the keep flag")

    // independent dominance check on exact (unrounded) ranks, recomputed
    // from the trained centroids with the same left-to-right double
    // arithmetic the Column expression uses
    val (assigned, centers) = Ivf.assignments(spark, sf)
    val rows = assigned
      .select(col("vec_id"), col("embedding"), col("cell"))
      .as[(Long, Array[Float], Int)].collect()
    val byCell = rows.groupBy(_._3)
    def score(emb: Array[Float]): Double = {
      def dot(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < emb.length) { s += emb(i).toDouble * c(i); i += 1 }
        s
      }
      val xn = math.sqrt(dot(emb.map(_.toDouble)))
      centers.map(c => c.map(x => x * x).sum - 2.0 * dot(c) / xn).min
    }
    val rank = rows.map { case (id, emb, _) => id -> score(emb) }.toMap
    rows.foreach { case (id, emb, cell) =>
      val dominated = byCell(cell).exists { case (oid, oemb, _) =>
        oid != id && cos(emb, oemb) > SemDedup.Epsilon &&
          (rank(oid) > rank(id) ||
            (rank(oid) == rank(id) && oid < id))
      }
      assert(out(id)._3 == !dominated,
        s"vec $id: keep=${out(id)._3} but dominated=$dominated")
    }
  }

  test("dropped vectors are justified: a duplicate exists and the cell keeps a survivor") {
    import spark.implicits._
    val out = SemDedup.semDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cell"), r.getAs[Boolean]("keep"))).toMap
    val (assigned, _) = Ivf.assignments(spark, sf)
    val embs = assigned.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val byCell = out.toSeq.groupBy(_._2._1)
    out.foreach { case (id, (cell, keep)) =>
      if (!keep) {
        // On a duplicate CHAIN the dominating neighbor may itself be
        // dropped (its own dominator survives transitively), so the
        // strongest direct guarantee the dominance rule gives is: a
        // dropped vector has >= 1 same-cell duplicate, and its cell
        // keeps >= 1 vector (local maxima always survive).
        val dups = byCell(cell).count { case (oid, _) =>
          oid != id && cos(embs(id), embs(oid)) > SemDedup.Epsilon
        }
        assert(dups >= 1, s"vec $id dropped without any duplicate")
        assert(byCell(cell).exists(_._2._2), s"cell $cell kept nothing")
      }
    }
  }
}
