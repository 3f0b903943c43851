package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram tokenizer checks: the distributed Viterbi value-DP must
  * equal an independent driver-side DP over the same trained piece
  * table, and the fertility invariants must hold per source. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Reference DP: min (cost, pieces) segmentation of `t` under
    * `costs`, written as the textbook O(n · MaxPiece) loop. */
  private def refDp(t: String, costs: Map[String, Long]): (Long, Long) = {
    val n = t.length
    val best = Array.fill[(Long, Long)](n + 1)((Long.MaxValue, Long.MaxValue))
    best(0) = (0L, 0L)
    for (i <- 1 to n; l <- 1 to math.min(Unigram.MaxPiece, i)) {
      costs.get(t.substring(i - l, i)).foreach { c =>
        val cand = (best(i - l)._1 + c, best(i - l)._2 + 1)
        if (best(i - l)._1 != Long.MaxValue &&
          (cand._1 < best(i)._1 ||
            (cand._1 == best(i)._1 && cand._2 < best(i)._2)))
          best(i) = cand
      }
    }
    best(n)
  }

  test("per-source fertility equals a driver-side re-derivation") {
    import spark.implicits._
    val out = Unigram.unigramEncode(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)

    val costs = Unigram.trainedCosts(spark, sf).toMap
    assert(costs.nonEmpty)
    // single-char fallback: every char of the corpus is a piece
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("source"), explode(TextQueries.words(col("text"))).as("t"))
      .as[(String, String)].collect()
    docs.map(_._2).distinct.flatMap(_.toSeq).distinct.foreach { ch =>
      assert(costs.contains(ch.toString), s"missing single-char piece '$ch'")
    }

    val expect = docs.groupBy(_._1).map { case (src, ws) =>
      val ts = ws.map(_._2)
      src -> (ts.length.toLong,
        ts.map(_.length.toLong).sum,
        ts.map(t => refDp(t, costs)._2).sum)
    }
    assert(out == expect)
  }

  test("fertility invariants: words <= tokens <= chars, multi-char pieces used") {
    val rows = Unigram.unigramEncode(spark, sf).collect()
    rows.foreach { r =>
      val (w, ch, tok) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= tok, "every word is at least one piece")
      assert(tok <= ch, "no piece is shorter than one char")
      assert(tok < ch, "trained pieces must beat char-level segmentation")
    }
  }
}
