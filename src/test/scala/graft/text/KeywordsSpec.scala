package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replay of the integer TF-IDF keyword ranking: tokenize
  * driver-side, compute bit-length idf and tf·idf weights, rank with the
  * same (weight desc, term asc) order, and pin the engine's top-k. */
class KeywordsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("top-k keywords equal the brute-force replay") {
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val tf = docs.toSeq.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, xs) => (id, t, xs.length.toLong) }
    }
    val n = docs.count(_._2.nonEmpty).toLong
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    def idfBits(t: String): Long =
      java.lang.Long.toBinaryString(n / df(t)).length.toLong
    val want = tf.groupBy(_._1).flatMap { case (id, xs) =>
      xs.map { case (_, t, f) => (t, f, idfBits(t), f * idfBits(t)) }
        .sortBy { case (t, _, _, w) => (-w, t) }
        .take(Keywords.TopK).zipWithIndex
        .map { case ((t, f, i, w), k) => (id, t, f, i, w, (k + 1).toLong) }
    }.toSet
    val got = Keywords.keywordTfidfTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("every doc with words gets exactly min(TopK, |terms|) keywords") {
    val perDoc = Keywords.keywordTfidfTopk(spark, sf).groupBy("doc_id")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
    for (r <- docs) {
      val nTerms = r.getString(1).split(" ").filter(_.nonEmpty).distinct.length
      if (nTerms > 0)
        assert(perDoc(r.getLong(0)) == math.min(Keywords.TopK, nTerms).toLong)
    }
  }

  test("the rank filter compiles to WindowGroupLimit (no corpus sort)") {
    val plan = Keywords.keywordTfidfTopk(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }
}
