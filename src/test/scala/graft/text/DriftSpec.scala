package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift-statistic invariants: a token at identical rates in both halves
  * scores exactly zero (the cross-multiplication cancels), a half-only
  * token tops its source's ranking, and output is bounded to top-k. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift")
    try {
      docs.toDF("doc_id", "text").withColumn("source", lit("fix"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Drift.sourceDrift(spark, dir.toString).collect()
        .map(r => r.getString(2) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("half-only token tops the ranking; balanced tokens score zero") {
    // doc 0/2 (half 0) and doc 1/3 (half 1) share the same filler text;
    // "driftword" appears only in half 0
    val filler = "alpha beta gamma delta"
    val r = run(Seq(
      0L -> s"$filler driftword driftword",
      2L -> s"$filler driftword",
      1L -> filler,
      3L -> filler))
    val byToken = r.toMap
    assert(r.head._1 == "driftword", s"ranking head was ${r.head._1}")
    assert(byToken("driftword")._1 == 3L && byToken("driftword")._2 == 0L)
    // filler tokens occur twice per half BUT the half totals differ
    // (driftword inflates half 0), so their cross-product is nonzero —
    // balanced-rate zero only holds when totals match; verify the exact
    // statistic instead: |n0*N1 - n1*N0| with N0=11, N1=8
    for (t <- Seq("alpha", "beta", "gamma", "delta")) {
      val (n0, n1, d) = byToken(t)
      assert(n0 == 2 && n1 == 2 && d == math.abs(2L * 8 - 2L * 11))
    }
  }

  test("identical halves drift zero for every token") {
    val r = run(Seq(
      0L -> "one two two three",
      1L -> "one two two three"))
    assert(r.forall(_._2._3 == 0L), s"nonzero drift in $r")
  }
}
