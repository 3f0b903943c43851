package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-concentration readout: the Lorenz curve of token mass across
  * crawl sources plus the Gini coefficient — the "is one source eating
  * the corpus" governance view beside `source_diversity` and
  * `dedup_by_source`.
  *
  * Everything that crosses the gate hash is INTEGER-EXACT: token
  * masses are whitespace-token counts summed as longs, the Lorenz
  * cumulative is a window over the SOURCE-BOUNDED ranked relation
  * (shuffle and window input ∝ sources, never docs), and Gini comes
  * from the closed form over ranked integer masses
  * `(2·Σ(rank·mass) − (n+1)·Σmass) / (n·Σmass)` — exact BIGINT
  * numerator and denominator, ONE double division, rounded once.
  * Shares pay one exact integer-to-integer division each. The only
  * corpus-sized work is the per-source token-count aggregation, whose
  * partials are map-side combined (∝ partitions × sources). */
object Concentration {

  def sourceConcentration(s: SparkSession, dir: String): DataFrame = {
    val mass = Tables.parallel(s, dir, "documents")
      .select(col("source"),
        size(TextQueries.words(col("text"))).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("token_mass"))
    // rank ascending by (mass, source): a total order, so row_number is
    // deterministic; the window input is the source-bounded rollup.
    val w = Window.orderBy(asc("token_mass"), asc("source"))
    val ranked = mass
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_mass",
        sum("token_mass").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val tot = ranked.agg(
      count(lit(1)).as("n_sources"),
      sum("token_mass").as("total_tokens"),
      sum(col("rank") * col("token_mass")).as("srm"))
    ranked.crossJoin(broadcast(tot))
      .select(col("rank"), col("source"), col("token_mass"), col("cum_mass"),
        round(col("token_mass").cast("double") /
          col("total_tokens").cast("double"), 6).as("share"),
        round(col("cum_mass").cast("double") /
          col("total_tokens").cast("double"), 6).as("cum_share"),
        round((lit(2L) * col("srm")
          - (col("n_sources") + 1L) * col("total_tokens")).cast("double") /
          (col("n_sources") * col("total_tokens")).cast("double"), 6)
          .as("gini"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_concentration" -> sourceConcentration)

  val oracles: Map[String, String] = Map(
    "source_concentration" ->
      """WITH mass AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '),
        |        x -> x <> '')))::BIGINT AS token_mass
        |  FROM documents GROUP BY source),
        |ranked AS (
        |  SELECT source, token_mass,
        |    row_number() OVER (ORDER BY token_mass, source)::BIGINT AS rank,
        |    sum(token_mass) OVER (ORDER BY token_mass, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cum_mass
        |  FROM mass),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n_sources,
        |    sum(token_mass)::BIGINT AS total_tokens,
        |    sum(rank * token_mass)::BIGINT AS srm
        |  FROM ranked)
        |SELECT rank, source, token_mass, cum_mass,
        |  round(token_mass::DOUBLE / total_tokens::DOUBLE, 6) AS share,
        |  round(cum_mass::DOUBLE / total_tokens::DOUBLE, 6) AS cum_share,
        |  round((2 * srm - (n_sources + 1) * total_tokens)::DOUBLE /
        |        (n_sources * total_tokens)::DOUBLE, 6) AS gini
        |FROM ranked CROSS JOIN tot""".stripMargin)
}
