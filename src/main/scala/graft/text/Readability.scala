package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flesch reading-ease scoring per document — the classic readability
  * readout a corpus-quality sweep publishes beside length/stopword
  * ratios (Flesch 1948; the text-quality tier next to
  * `text_quality` / `quality_gopher`).
  *
  * Counting is defined in REGEX RUNS so both engines compute the exact
  * same integers with no UDF: words are the engine-wide whitespace
  * tokens ([[TextQueries.words]]), syllables are maximal `[aeiouy]+`
  * runs of the lowercased text (the standard vowel-group estimator,
  * doc-level), sentences are maximal `[.!?]+` terminator runs (floored
  * at 1 so headline-like docs don't divide by zero). The score is two
  * integer-ratio divisions and two constant multiplies — IEEE-identical
  * cross-engine — rounded once at the boundary; the band CASE reads the
  * ROUNDED score so banding can never straddle an epsilon. Pure
  * projection + one small rollup: zero shuffle for the per-doc face at
  * any corpus size. */
object Readability {

  /** Count of maximal runs matched by `sep`-complement splitting:
    * split on the pattern, drop empties, take the length. */
  private def runCount(c: Column, pattern: String): Column =
    size(filter(split(c, pattern), x => x =!= ""))

  def readability(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallel(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("n_words", size(TextQueries.words(col("text"))).cast("long"))
      .withColumn("n_syllables",
        runCount(lower(col("text")), "[^aeiouy]+").cast("long"))
      .withColumn("n_sentences",
        greatest(runCount(col("text"), "[^.!?]+"), lit(1L)).cast("long"))
      .filter(col("n_words") > 0)
    d.select(col("doc_id"), col("n_words"), col("n_sentences"),
      col("n_syllables"),
      round(lit(206.835)
        - lit(1.015) * (col("n_words").cast("double") /
          col("n_sentences").cast("double"))
        - lit(84.6) * (col("n_syllables").cast("double") /
          col("n_words").cast("double")), 4).as("flesch"))
      .withColumn("band",
        when(col("flesch") >= 70.0, "easy")
          .when(col("flesch") >= 50.0, "medium")
          .otherwise("hard"))
  }

  /** Corpus rollup: band populations and per-band mean score — the
    * one-line dashboard row. Mean is computed from e4-integer score
    * sums (flesch is 4-decimal) so the aggregate is order-independent
    * and hash-exact. */
  def readabilityBands(s: SparkSession, dir: String): DataFrame =
    readability(s, dir)
      .select(col("band"), col("n_words"),
        round(col("flesch") * 10000, 0).cast("long").as("e4"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        round(sum("e4").cast("double") / count(lit(1)).cast("double")
          / 10000.0, 4).as("mean_flesch"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "readability" -> readability,
    "readability_bands" -> readabilityBands)

  private val CoreSql =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
      |    AS n_words,
      |  greatest(len(list_filter(
      |    regexp_split_to_array(text, '[^.!?]+'), x -> x <> '')),
      |    1)::BIGINT AS n_sentences,
      |  len(list_filter(
      |    regexp_split_to_array(lower(text), '[^aeiouy]+'),
      |    x -> x <> ''))::BIGINT AS n_syllables
      |FROM documents""".stripMargin

  val oracles: Map[String, String] = Map(
    "readability" ->
      s"""WITH c AS ($CoreSql),
        |f AS (
        |  SELECT doc_id, n_words, n_sentences, n_syllables,
        |    round(206.835
        |      - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |      - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 4)
        |      AS flesch
        |  FROM c WHERE n_words > 0)
        |SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
        |  CASE WHEN flesch >= 70.0 THEN 'easy'
        |       WHEN flesch >= 50.0 THEN 'medium'
        |       ELSE 'hard' END AS band
        |FROM f""".stripMargin,
    "readability_bands" ->
      s"""WITH c AS ($CoreSql),
        |f AS (
        |  SELECT doc_id, n_words,
        |    round(206.835
        |      - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |      - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 4)
        |      AS flesch
        |  FROM c WHERE n_words > 0),
        |b AS (
        |  SELECT CASE WHEN flesch >= 70.0 THEN 'easy'
        |              WHEN flesch >= 50.0 THEN 'medium'
        |              ELSE 'hard' END AS band,
        |    n_words, round(flesch * 10000)::BIGINT AS e4
        |  FROM f)
        |SELECT band, count(*)::BIGINT AS n_docs,
        |  sum(n_words)::BIGINT AS total_words,
        |  round(sum(e4)::DOUBLE / count(*)::DOUBLE / 10000.0, 4)
        |    AS mean_flesch
        |FROM b GROUP BY band""".stripMargin)
}
