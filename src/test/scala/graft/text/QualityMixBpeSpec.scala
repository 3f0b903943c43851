package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-3 text operators (values are hash-oracled by
  * the gate; these pin what the oracles can't express): flag/verdict
  * consistency for the Gopher rules, normalization + monotonicity for the
  * mixture weights, and the exact merge sequence + greedy application
  * order for the BPE trainer. */
class QualityMixBpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("quality_gopher: pass is exactly the conjunction of its four flags") {
    val q = TextQueries.qualityGopher(spark, sf).cache()
    assert(q.filter(col("pass") =!=
      (col("len_ok") && col("mean_len_ok") && col("alpha_ok") && col("stop_ok")))
      .count() == 0)
    // flags restate the emitted stats
    assert(q.filter(col("len_ok") =!= col("n_words")
      .between(TextQueries.GopherMinWords, TextQueries.GopherMaxWords))
      .count() == 0)
    assert(q.filter(col("stop_ok") =!=
      (col("n_stop") >= TextQueries.GopherMinStopHits)).count() == 0)
    // both populations exercised — thresholds aren't vacuous on this corpus
    assert(q.filter(col("pass")).count() > 0)
    assert(q.filter(!col("pass")).count() > 0)
    q.unpersist()
  }

  test("mix_weights: weights normalize to 1 and order by token mass") {
    val m = Sampling.mixWeights(spark, sf).cache()
    import spark.implicits._
    val total = m.agg(sum("weight")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-4, s"weights sum to $total")
    // alpha=0.5 keeps ordering: more tokens => weight no smaller
    val inverted = m.as("a").join(m.as("b"),
      col("a.tokens") > col("b.tokens") &&
        col("a.weight") < col("b.weight"))
    assert(inverted.count() == 0)
    // sub-linear: weight ratio strictly below token ratio for unequal pairs
    val superLinear = m.as("a").join(m.as("b"),
      col("a.tokens") > col("b.tokens") &&
        col("a.weight") / col("b.weight") >=
          col("a.tokens").cast("double") / col("b.tokens"))
    assert(superLinear.count() == 0)
    m.unpersist()
  }

  test("bpe trainMerges learns the classic low/lower/lowest sequence") {
    import spark.implicits._
    val docs = Seq("low lower lowest").toDF("text")
    val merges = Bpe.trainMerges(Bpe.symbolize(docs), 3)
    assert(merges == Seq(
      (("l", "o"), 3L),   // ties (l,o)/(o,w) at 3 break to (a,b) asc
      (("lo", "w"), 3L),
      (("low", "e"), 2L)))
  }

  test("bpe merge application is left-to-right greedy: aaa -> [aa, a]") {
    import spark.implicits._
    val docs = Seq("aaa").toDF("text")
    val merges = Bpe.trainMerges(Bpe.symbolize(docs), 1)
    // "aaa" has two overlapping (a,a) pairs; both counted, merged once left-first
    assert(merges == Seq((("a", "a"), 2L)))
  }

  test("cooccur pairs are canonical and adjacency-bounded") {
    val c = TextQueries.cooccurTopk(spark, sf).cache()
    assert(c.filter(col("a") > col("b")).count() == 0)
    assert(c.filter(col("n_adjacent") > col("n") || col("n") <= 0)
      .count() == 0)
    // counts are non-increasing in emitted order (top-k contract)
    val ns = c.select("n").collect().map(_.getLong(0))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
    c.unpersist()
  }

  test("bpe_pairs gate query is deterministic and bounded") {
    val a = Bpe.bpePairs(spark, sf).collect()
    val b = Bpe.bpePairs(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length <= Bpe.TopPairs)
    // counts are non-increasing in emitted order
    val ns = a.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
  }
}
