package graft.dedup

import graft.dedup.DedupQueries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** b-bit minhash (Li & König, WWW 2010) — the storage-compression dial
  * of the minhash family: keep only the LOWEST b bits of each
  * permutation's min-hash. At b=1 a signature is 16 bits instead of 16
  * × 64-bit values (a 64× memory/shuffle reduction for the signature
  * relation), at the price of collision noise: an unequal pair's bits
  * still agree with probability ≈ 1/2, so the estimator rescales the
  * agreement rate p̂ as Ĵ = 2·p̂ − 1 (the b=1 form of Li & König's
  * unbiased estimator in the small-r regime; can go negative on
  * far-apart pairs — emitted unclamped, the honest estimator).
  *
  * The gate query emits, per LSH-verified near-dup pair, the exact
  * Jaccard next to BOTH signature estimates (full 64-bit values vs
  * 1-bit) — the table you read before flipping a production pipeline
  * to compressed signatures. All columns are integer-derived ratios
  * (matches / 16), so the oracle is exact hash equality.
  *
  * Scale shape: identical joins to `dedup_minhash_lsh` (the signature
  * relation is vocab-of-docs-sized, candidates LSH-bounded); the b-bit
  * payoff is signature BYTES, which the scale law already treats as
  * doc-proportional. */
object BbitMinhash {

  /** Estimator agreement sum over the packed 1-bit signature columns. */
  private def matches(expr0: Int => org.apache.spark.sql.Column) =
    (0 until NumPerms).map(expr0).reduce(_ + _)

  def dedupBbitMinhash(s: SparkSession, dir: String): DataFrame = {
    // the MEMOIZED (signatures, verified pairs) — the pair relation and
    // its est_jaccard column ARE this query's jaccard/est_full columns
    // (identical arithmetic), so only the 1-bit agreement is new work:
    // two signature joins over the verified survivors.
    val (mh, pairs) = lshArtifacts(s, dir)
    val est1 = matches(j =>
      when(col(s"ma.h$j") % 2 === col(s"mb.h$j") % 2, 1).otherwise(0))
    pairs
      .join(mh.as("ma"), col("a_id") === col("ma.doc_id"))
      .join(mh.as("mb"), col("b_id") === col("mb.doc_id"))
      .select(col("a_id"), col("b_id"), col("jaccard"),
        col("est_jaccard").as("est_full"),
        round((est1 * 2 - lit(NumPerms)) / lit(16.0), 4).as("est_1bit"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_bbit_minhash" -> dedupBbitMinhash)

  val oracles: Map[String, String] = {
    val estFull = (0 until NumPerms)
      .map(j => s"CASE WHEN ma.h$j = mb.h$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    val est1 = (0 until NumPerms)
      .map(j => s"CASE WHEN ma.h$j % 2 = mb.h$j % 2 THEN 1 ELSE 0 END")
      .mkString(" + ")
    Map("dedup_bbit_minhash" ->
      (s"WITH $lshPairsCte\n" +
        s"""SELECT l.a_id, l.b_id, l.jaccard,
           |  round(($estFull) / 16.0, 4) AS est_full,
           |  round((($est1) * 2 - $NumPerms) / 16.0, 4) AS est_1bit
           |FROM lshpairs l
           |JOIN mh ma ON ma.doc_id = l.a_id
           |JOIN mh mb ON mb.doc_id = l.b_id""".stripMargin))
  }
}
