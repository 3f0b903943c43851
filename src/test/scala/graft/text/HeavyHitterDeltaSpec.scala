package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replay of the half-over-half token delta: split by the
  * (min+max)/2 doc_id midpoint driver-side, count tokens per half, rank
  * by (|delta| desc, token asc), and pin the engine's top-k. */
class HeavyHitterDeltaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("top-k token deltas equal the driver replay") {
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val mid = (docs.map(_._1).min + docs.map(_._1).max) / 2
    val counts = docs.flatMap { case (id, ts) => ts.map(id -> _) }
      .groupBy(_._2).map { case (t, xs) =>
        val early = xs.count(_._1 <= mid).toLong
        val late = xs.count(_._1 > mid).toLong
        (t, early, late, late - early)
      }
    val want = counts.toSeq
      .sortBy { case (t, _, _, d) => (-math.abs(d), t) }
      .take(HeavyHitterDelta.TopK).toSet
    val got = HeavyHitterDelta.tokenFreqDelta(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("per-token half counts sum to the token's corpus frequency") {
    val got = HeavyHitterDelta.tokenFreqDelta(spark, sf).collect()
    val freq = graft.Tables(spark, sf, "documents").collect()
      .flatMap(r => r.getAs[String]("text").split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    for (r <- got)
      assert(r.getLong(1) + r.getLong(2) == freq(r.getString(0)))
  }
}
