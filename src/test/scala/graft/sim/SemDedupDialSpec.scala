package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ε dial of semantic dedup: raising the duplicate threshold can
  * only shrink the dominated set (cos > ε is a stricter predicate), so
  * the kept count is non-decreasing in ε — the dedup-rate/recall trade
  * the paper sweeps, proven monotone here on the planted corpus. */
class SemDedupDialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("kept count is monotone non-decreasing in epsilon") {
    val (assigned, centers) = Ivf.assignments(spark, sf)
    val kept = Seq(0.2, 0.35, 0.5, 0.65).map { eps =>
      eps -> SemDedup.verdicts(assigned, centers, eps)
        .filter(col("keep")).count()
    }
    kept.sliding(2).foreach { case Seq((e1, k1), (e2, k2)) =>
      assert(k1 <= k2, s"kept dropped from $k1 (eps=$e1) to $k2 (eps=$e2)")
    }
    // The endpoint asserts are DERIVED from the data, not assumed of the
    // fixture: a driver testdata regen with different cosine structure
    // must not redden this spec without a code defect.
    val maxCos = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(max(SimilarityQueries.cosine(
        col("a.embedding"), col("b.embedding"))).as("m"))
      .head().getDouble(0)
    // no within-cell pair above the loosest eps ⇒ nothing dominated there
    if (maxCos < kept.last._1)
      assert(kept.last._2 == assigned.count())
    // a pair above the strictest eps forces ≥1 drop at the strict end,
    // and none above the loosest means 0 drops there ⇒ the dial moved
    if (maxCos > kept.head._1 && maxCos < kept.last._1)
      assert(kept.head._2 < kept.last._2)
  }
}
