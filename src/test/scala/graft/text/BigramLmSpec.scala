package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property that earns the bigram scorer its slot next to the
  * unigram filter: word-salad built from COMMON tokens — invisible to a
  * unigram model — pays backoff surprisal on its scrambled transitions
  * and scores strictly worse than fluent text over the same vocabulary. */
class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("scrambled word order scores worse; unigram counts cannot tell") {
    import spark.implicits._
    // doc 1 repeats the corpus's dominant phrasing; doc 2 uses the SAME
    // words with scrambled transitions. k=2 keeps only the two dominant
    // transitions in the model, so doc 2 pays backoff.
    val docs = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "b b a a b a b b a a")).toDF("doc_id", "text")
    val out = BigramLm.scored(docs, 2)
      .select(col("doc_id"), col("bg_score"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) < out(2L), s"fluent ${out(1L)} !< scrambled ${out(2L)}")
    // identical unigram profile: 5 a's and 5 b's each — a unigram filter
    // sees the two documents as the same
    val uni = docs
      .select(col("doc_id"), explode(TextQueries.words(col("text"))).as("t"))
      .groupBy("doc_id", "t").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(uni((1L, "a")) == uni((2L, "a")) && uni((1L, "b")) == uni((2L, "b")))
  }

  test("model rides a broadcast join; no cartesian sneaks in") {
    val plan = BigramLm.qualityBigramScore(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("gate query populates both seen and backoff paths") {
    val r = BigramLm.qualityBigramScore(spark, "/root/testdata/sf0.001").cache()
    assert(r.count() > 0)
    // scores spread across the seen/backoff mix, all within bit bounds
    assert(r.filter(col("bg_score") < 1.0).count() == 0)
    val grades = r.select("grade").distinct().collect().map(_.getString(0)).toSet
    assert(grades.nonEmpty)
    r.unpersist()
  }
}
