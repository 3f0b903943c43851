package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Complete plain-Scala re-derivation of substring decontamination: for
  * EVERY (corpus doc, eval doc) pair, recompute the shared-k-gram set
  * and the covered-position union directly from the texts; the query's
  * output must equal the full expected relation — no missed pair, no
  * phantom pair, exact counts. (Also pins the rule's strictness: a
  * single shared ≥k-token verbatim run flags, unlike the shingle rule's
  * ≥5-overlap threshold.) */
class DecontamSubstringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("output equals the complete pairwise re-derivation") {
    val k = SubstringDedup.SubstrK
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    def grams(w: Array[String]): Map[String, Seq[Int]] =
      if (w.length < k) Map.empty
      else (1 to w.length - k + 1)
        .map(i => i -> w.slice(i - 1, i - 1 + k).mkString(" "))
        .groupBy(_._2).view.mapValues(_.map(_._1)).toMap

    val evalIds = docs.keys.filter(_ < DedupQueries.DecontamEvalDocs)
    val corpusIds = docs.keys.filter(_ >= DedupQueries.DecontamEvalDocs)
    val evalGrams = evalIds.map(e => e -> grams(docs(e)).keySet).toMap

    val expected = (for {
      c <- corpusIds
      cg = grams(docs(c))
      e <- evalIds
      shared = cg.keySet & evalGrams(e)
      if shared.nonEmpty
    } yield {
      val covered = shared.toSeq.flatMap(cg(_))
        .flatMap(i => i until i + k).distinct.size
      (c, e, shared.size.toLong, covered.toLong)
    }).toSet

    val got = SubstringDedup.decontamSubstring(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"drift: query-only=${got -- expected}, derived-only=${expected -- got}")
    assert(expected.nonEmpty, "fixture must contain contaminated pairs")
  }
}
