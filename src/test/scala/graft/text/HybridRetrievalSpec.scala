package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** RRF fusion contract: exact contribution arithmetic, rank consistency
  * with the two source retrievers, and both-lists dominance. */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def collectFused() =
    HybridRetrieval.hybridRrfTopk(spark, sf).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3))
    }

  test("rrf_score is exactly the sum of the per-list reciprocal ranks") {
    val k = HybridRetrieval.RrfK
    collectFused().foreach { case (id, lex, vec, score) =>
      val expect = lex.map(r => 1.0 / (k + r)).getOrElse(0.0) +
        vec.map(r => 1.0 / (k + r)).getOrElse(0.0)
      assert(score == expect, s"doc $id fused score")
      assert(lex.nonEmpty || vec.nonEmpty, s"doc $id in neither list")
    }
  }

  test("lex ranks agree with the bm25 top-k ordering") {
    // bm25 gate output is already ordered by exact total desc, doc_id asc
    val bmOrder = Retrieval.bm25TopK(spark, sf).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }
      .toMap
    val fused = collectFused()
    fused.foreach { case (id, lex, _, _) =>
      lex.foreach { r =>
        // ListDepth == Retrieval.TopK == 20, so ranks must agree exactly
        assert(bmOrder.get(id).contains(r), s"doc $id lex rank $r")
      }
    }
    // and any fused doc missing a lex rank is genuinely outside the list
    fused.filter(_._2.isEmpty).foreach { case (id, _, _, _) =>
      assert(!bmOrder.contains(id), s"doc $id should have a lex rank")
    }
  }

  test("a doc ranked first in both lists dominates every fusion score") {
    val fused = collectFused()
    val best = 2.0 / (HybridRetrieval.RrfK + 1)
    fused.foreach { case (_, _, _, s) => assert(s <= best) }
    // descending output order with doc_id tiebreak
    fused.sliding(2).foreach {
      case Array((id1, _, _, s1), (id2, _, _, s2)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2), "fusion order")
      case _ => ()
    }
  }

  test("fusion surfaces docs from both retrievers") {
    val fused = collectFused()
    assert(fused.nonEmpty)
    assert(fused.exists(_._2.nonEmpty), "no lexically-ranked doc in fusion")
    assert(fused.exists(_._3.nonEmpty), "no vector-ranked doc in fusion")
  }
}
