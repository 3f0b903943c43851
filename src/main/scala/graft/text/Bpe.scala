package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding primitives over the `documents` corpus — the
  * tokenizer-training side of a data pipeline (Sennrich et al. 2016):
  *
  *  - [[bpePairs]]: corpus-wide adjacent-character-pair frequencies (the
  *    statistic the first BPE merge is chosen from), as a gate query with
  *    a DuckDB oracle;
  *  - [[trainMerges]]: the full iterative trainer — k rounds of
  *    count-pairs → pick argmax → apply merge, each round one distributed
  *    aggregation over the symbolized corpus.
  *
  * Scale shape: every round is one explode + one count shuffle (the same
  * shape as `vocab_topk`), and the merge application is a per-row fold —
  * no driver-side data beyond the single winning pair per round. Real
  * trainers batch counts over a word-frequency table instead of raw
  * occurrences; `trainMerges` accepts any DataFrame with a `sym`
  * array<string> column so that substitution is a one-line input change.
  */
object Bpe {

  val TopPairs = 20

  /** Adjacent 2-char pair counts within words, top [[TopPairs]] by count
    * (ties broken by pair). The `length >= 2` guard precedes the
    * `sequence(1, n-1)` so the sequence bounds are always ascending. */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents")
      .select(explode(TextQueries.words(col("text"))).as("t"))
      .filter(length(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(t) - 1), i -> substring(t, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(TopPairs)

  /** Symbolize a corpus for [[trainMerges]]: one row per word occurrence,
    * `sym` = its character array. */
  def symbolize(docs: DataFrame): DataFrame =
    docs.select(explode(TextQueries.words(col("text"))).as("t"))
      .select(expr(
        "transform(sequence(1, char_length(t)), i -> substring(t, i, 1))")
        .as("sym"))

  /** Train `k` BPE merges over a `sym: array<string>` corpus. Each round:
    * count adjacent symbol pairs (one aggregation job), pick the most
    * frequent (count desc, then (a, b) asc for determinism), rewrite every
    * row with a left-to-right greedy fold — the standard BPE application
    * order, so "aaa" under merge (a,a) becomes ["aa", "a"]. Returns the
    * merge list as ((a, b), count). */
  def trainMerges(symbolized: DataFrame, k: Int): Seq[((String, String), Long)] = {
    var syms = symbolized.select(col("sym")).cache()
    val merges = Seq.newBuilder[((String, String), Long)]
    try {
      for (_ <- 0 until k) {
        val top = syms
          .filter(size(col("sym")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(sym) - 1),
              |  i -> struct(element_at(sym, i) AS a,
              |              element_at(sym, i + 1) AS b))""".stripMargin))
            .as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("a"), asc("b"))
          .limit(1)
          .collect()
        if (top.isEmpty) return merges.result()
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += (((a, b), n))
        // Symbols come from the data, so they MUST be escaped before being
        // inlined into SQL text — an apostrophe-bearing corpus (any natural
        // language) would otherwise crash the round (or worse, let data
        // inject expressions).
        def q(v: String) = "'" + v.replace("'", "''") + "'"
        val (qa, qb, qm) = (q(a), q(b), q(a + b))
        val next = syms.select(expr(
          s"""aggregate(sym, cast(array() AS array<string>),
             |  (acc, x) -> CASE WHEN size(acc) > 0
             |      AND element_at(acc, size(acc)) = $qa AND x = $qb
             |    THEN concat(slice(acc, 1, size(acc) - 1), array($qm))
             |    ELSE concat(acc, array(x)) END)""".stripMargin).as("sym"))
          .cache()
        next.count() // materialize before dropping the parent cache
        syms.unpersist()
        syms = next
      }
      merges.result()
    } finally syms.unpersist()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_pairs" -> bpePairs)

  val oracles: Map[String, String] = Map(
    "bpe_pairs" ->
      (s"WITH ${TextQueries.wordsCte},\n" +
        s"""t AS (SELECT unnest(w) AS t FROM w),
          |p AS (SELECT unnest(list_transform(range(1, length(t)),
          |               i -> substr(t, i, 2))) AS pair
          |      FROM t WHERE length(t) >= 2)
          |SELECT pair, count(*) AS n FROM p GROUP BY pair
          |ORDER BY n DESC, pair ASC LIMIT $TopPairs""".stripMargin))
}
