package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix filtering's contract is EXACTNESS with a smaller join: the
  * candidate set must contain every qualifying pair (losslessness — also
  * hash-gated against the exhaustive oracle), the prefix relation must
  * be the per-doc `n - ceil(t*n) + 1` rarest-first cut of the pruned
  * shingles, and the prefix join must expand strictly fewer shared-token
  * pairs than the exhaustive join it replaces (the point of running it).
  * Losslessness is asserted by comparing against verify() run over the
  * UNFILTERED co-occurrence pair set — same verification code path, so
  * rounding/threshold semantics cannot drift between the two sides. */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("prefix relation is the rarest-first n-ceil(tn)+1 cut of shp") {
    val sh = DedupQueries.prunedShingles(spark, sf)
    val prefix = PrefixJoin.prefixTokens(sh).select("doc_id", "s").cache()
    try {
      assert(prefix.except(sh).count() == 0, "prefix token not in shp")
      val got = prefix.groupBy("doc_id").agg(count(lit(1)).as("p"))
      val want = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .select(col("doc_id"),
          PrefixJoin.prefixLen(col("n")).cast("long").as("p"))
      assert(got.except(want).count() == 0 && want.except(got).count() == 0,
        "per-doc prefix length != n - ceil(t*n) + 1")
    } finally prefix.unpersist()
  }

  test("prefix-filtered result equals the exhaustive exact join") {
    val sh = DedupQueries.prunedShingles(spark, sf)
    // All co-occurring pairs = candidatePairs over the FULL relation
    // (prefix of length n); verify() applied to both sides.
    val exhaustive = PrefixJoin.verify(PrefixJoin.candidatePairs(sh), sh)
    val filtered = PrefixJoin.dedupPrefixJaccard(spark, sf)
    assert(filtered.except(exhaustive).count() == 0 &&
      exhaustive.except(filtered).count() == 0,
      "prefix filtering changed the verified pair set")
  }

  test("prefix join expands less work than the exhaustive join") {
    val sh = DedupQueries.prunedShingles(spark, sf)
    def expansion(r: org.apache.spark.sql.DataFrame): Long =
      r.as("x").join(r.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .count()
    val full = expansion(sh)
    val pref = expansion(PrefixJoin.prefixTokens(sh))
    assert(pref < full,
      s"prefix expansion $pref not below exhaustive $full")
  }

  test("high-threshold prefixes are small: ~(1-t)n + 1 per doc") {
    val sh = DedupQueries.prunedShingles(spark, sf)
    val frac = PrefixJoin.prefixTokens(sh).count().toDouble / sh.count()
    // n - ceil(0.8n) + 1 <= 0.2n + 1; fixture docs are ~50 shingles so
    // the +1 keeps the corpus-wide ratio a bit above 0.2.
    assert(frac < 0.3, s"prefix fraction $frac not in the t=0.8 regime")
  }
}
