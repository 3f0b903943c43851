package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GPT-2-family regex pre-tokenization (Radford et al. 2019: the
  * `\'s | ?\p{L}+| ?\p{N}+|…` splitter every byte-BPE tokenizer runs
  * BEFORE merge training, so merges never cross word/number/punct
  * boundaries). The pattern here is the lookahead-free core of that
  * splitter — contraction suffixes, space-prefixed letter runs, digit
  * runs, punctuation runs, residual spaces — restricted to the
  * lookahead-free subset BOTH engines' regex dialects (Java util.regex
  * and RE2) match identically with leftmost-first alternation.
  *
  * Gate query: corpus-wide pre-token frequencies, top [[TopK]] by
  * (count desc, token asc) — the relation a byte-BPE trainer consumes
  * as its word-frequency table (the `Bpe.symbolizeWeighted` input, with
  * boundary semantics upgraded from whitespace-split to GPT-2 rules).
  *
  * Scale shape: `regexp_extract_all` fans out in-partition (one scan,
  * no join), the count is one map-side-combined aggregation keyed by
  * token — the `vocab_topk` shape: shuffle ∝ partitions × distinct
  * tokens, TakeOrdered caps the result. */
object Pretokenize {

  /** Lookahead-free GPT-2-style splitter. Alternation order IS the
    * semantics (leftmost-first): contractions before letter runs,
    * letter/digit runs before the punctuation catch-all. */
  val Pattern =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+| +"

  val TopK = 30

  def pretokenizeCounts(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents")
      .select(explode(
        regexp_extract_all(col("text"), lit(Pattern), lit(0))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("tok"))
      .limit(TopK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pretokenize_counts" -> pretokenizeCounts)

  val oracles: Map[String, String] = Map(
    "pretokenize_counts" ->
      s"""SELECT tok, count(*) AS n
         |FROM (SELECT unnest(regexp_extract_all(text,
         |        '${Pattern.replace("'", "''")}')) AS tok
         |      FROM documents)
         |GROUP BY tok
         |ORDER BY n DESC, tok ASC
         |LIMIT $TopK""".stripMargin)
}
