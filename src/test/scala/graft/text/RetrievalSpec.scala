package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 scoring checked against an independent scalar re-computation on a
  * hand-built corpus, plus ranking-shape and plan-shape invariants. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // doc_id -> text; every QueryTerm appears somewhere, "dup" is rare.
  private val corpus = Seq(
    (1L, "dup dup spark"),
    (2L, "spark spark spark scan"),
    (3L, "merge window zz"),
    (4L, "zz zz zz zz zz zz"))

  /** Scalar BM25 mirror of the Column expression tree (same op order). */
  private def expected(): Map[Long, Double] = {
    val words = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toLong
    val sumDl = words.values.map(_.size).sum.toLong
    val avgdl = sumDl.toDouble / n
    val dfc = Retrieval.QueryTerms.map(t =>
      t -> words.values.count(_.contains(t)).toLong).toMap
    corpus.map { case (id, _) =>
      val dl = words(id).size
      val total = Retrieval.QueryTerms.map { t =>
        val tf = words(id).count(_ == t).toLong
        if (tf == 0 || dfc(t) == 0) 0.0
        else {
          val idf = ((n - dfc(t)) + 0.5) / (dfc(t) + 0.5)
          val norm = Retrieval.K1 * ((1 - Retrieval.B) +
            (Retrieval.B * dl) / avgdl)
          (idf * (tf * (Retrieval.K1 + 1))) / (tf + norm)
        }
      }.sum
      id -> total
    }.toMap
  }

  test("bm25 totals match an independent scalar computation") {
    import spark.implicits._
    val out = Retrieval.bm25(corpus.toDF("doc_id", "text"))
      .select(col("doc_id"), col("score"))
      .as[(Long, Double)].collect().toMap
    // d4 matches no query term: never enters the tf relation, so it is
    // not retrieved at all (same semantics as the oracle SQL)
    val exp = expected().filter(_._2 > 0.0)
    assert(out.keySet == exp.keySet)
    for ((id, s) <- out)
      assert(math.abs(s - exp(id)) < 5e-5, s"doc $id: $s vs ${exp(id)}")
  }

  test("rare term outranks common term at equal tf") {
    import spark.implicits._
    // same dl, one "dup" (rare in this corpus) vs one "spark"
    val c = Seq((1L, "dup zz"), (2L, "spark zz"), (3L, "spark qq"),
      (4L, "spark yy")).toDF("doc_id", "text")
    val m = Retrieval.bm25(c).select(col("doc_id"), col("score"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) > m(2L))
  }

  test("top-k is a TakeOrdered, dims broadcast, never a global sort") {
    val plan = Retrieval.bm25TopK(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
