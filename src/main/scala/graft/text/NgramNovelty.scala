package graft.text

import graft.Tables
import graft.dedup.DedupQueries
import graft.text.TextQueries.{trigrams, words}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source n-gram novelty — for every source, how much genuinely NEW
  * text it contributes: of the distinct trigrams that occur in its
  * documents, how many make their global first appearance there (first
  * appearance = the corpus-wide minimum `doc_id` carrying the trigram,
  * a total order shared with the snapshot-dedup keeper rule). The
  * data-recipe complement to [[graft.dedup.DedupQueries.sourceOverlap]]:
  * overlap measures what a source SHARES, novelty measures what it
  * INTRODUCES — the pair drives mixture weighting ([[Sampling]]) when
  * deciding whether another crawl snapshot of a source still adds mass.
  *
  * Scale shape at 100 TB: rides the engine-wide shingle relation
  * ([[DedupQueries.shingles]] — one corpus scan, explode linear in
  * tokens); first-occurrence is a groupBy-min over trigrams with
  * map-side partials (never a window over an unbounded hot-shingle
  * partition); the join back to resolve the winning doc's source is
  * shuffle-by-doc_id, linear; the final rollup is source-bounded. No
  * pairwise anything — unlike overlap matrices this never grows faster
  * than the corpus. */
object NgramNovelty {

  /** source, n_docs, distinct_grams (trigrams occurring in the source),
    * n_introduced (trigrams globally first seen in one of its docs),
    * novelty_frac = n_introduced / distinct_grams (rounded 4dp). */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val sh = DedupQueries.shingles(s, dir).localCheckpoint(true)
    // global first-occurrence doc per trigram → that doc's source
    val intro = sh.groupBy("s").agg(min("doc_id").as("doc_id"))
      .join(docs, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_introduced"))
    // distinct trigram footprint per source
    val foot = sh.join(docs, "doc_id")
      .select("source", "s").distinct()
      .groupBy("source").agg(count(lit(1)).as("distinct_grams"))
    val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    nd.join(foot, Seq("source"), "left")
      .join(intro, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("distinct_grams"), lit(0L)).as("distinct_grams"),
        coalesce(col("n_introduced"), lit(0L)).as("n_introduced"),
        when(coalesce(col("distinct_grams"), lit(0L)) > 0,
          round(coalesce(col("n_introduced"), lit(0L)) /
            col("distinct_grams"), 4)).otherwise(lit(0.0))
          .as("novelty_frac"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ngram_novelty" -> ngramNovelty)

  val oracles: Map[String, String] = Map(
    "ngram_novelty" ->
      (s"WITH ${DedupQueries.shinglesCte},\n" +
        """docs AS (SELECT doc_id, source FROM documents),
          |intro AS (
          |  SELECT d.source, count(*)::BIGINT AS n_introduced
          |  FROM (SELECT s, min(doc_id) AS doc_id FROM sh GROUP BY s) f
          |  JOIN docs d USING (doc_id) GROUP BY 1),
          |foot AS (
          |  SELECT source, count(*)::BIGINT AS distinct_grams FROM (
          |    SELECT DISTINCT d.source, sh.s FROM sh
          |    JOIN docs d USING (doc_id)) GROUP BY 1),
          |nd AS (SELECT source, count(*)::BIGINT AS n_docs
          |       FROM docs GROUP BY 1)
          |SELECT nd.source, nd.n_docs,
          |  coalesce(foot.distinct_grams, 0)::BIGINT AS distinct_grams,
          |  coalesce(intro.n_introduced, 0)::BIGINT AS n_introduced,
          |  CASE WHEN coalesce(foot.distinct_grams, 0) > 0
          |    THEN round(coalesce(intro.n_introduced, 0) * 1.0
          |           / foot.distinct_grams, 4)
          |    ELSE 0.0 END AS novelty_frac
          |FROM nd LEFT JOIN foot USING (source)
          |LEFT JOIN intro USING (source)""".stripMargin))
}
