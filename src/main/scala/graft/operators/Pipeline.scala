package graft.operators

import graft.Tables
import graft.dedup.{ConnectedComponents, DedupQueries}
import graft.text.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end preprocessing funnel — the composition a training-data
  * build actually runs, as ONE gate row of stage-by-stage accounting:
  *
  *   raw corpus → exact-dedup keepers → near-dup cluster keepers →
  *   Gopher quality filter → final doc/token counts.
  *
  * Dedup runs before quality scoring (each duplicate would otherwise be
  * scored, and the keeper decision is content-based so filtering first
  * could drop a cluster's keeper while a near-identical non-keeper
  * passes). Every stage reuses the exact operator the standalone gate
  * queries ship — [[ConnectedComponents.removalTiers]] for both dedup
  * tiers, [[TextQueries.gopherFlags]] for the rule set — so the funnel
  * cannot drift from its parts, and the oracle composes the same proven
  * CTE chains. Scale: nothing here is new movement — the funnel is the
  * dedup pair pipeline plus one anti-join and one scan-shaped filter.
  */
object Pipeline {

  def pipelineFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        size(TextQueries.words(col("text"))).cast("long").as("n_tok"))
    val (exactRemoved, nearRemoved) = ConnectedComponents.removalTiers(s, dir)
    // the surviving corpus is read three times (its count, the quality
    // flags, and the final token join) — materialize it once, exactly as
    // a real build would write the post-dedup corpus before scoring it
    val surv = docs.join(
      exactRemoved.unionByName(nearRemoved), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val fin = TextQueries.gopherFlags(surv).filter(col("pass"))
      .select(col("doc_id"))
      .join(surv, "doc_id")
    docs.agg(count(lit(1)).as("n_docs_raw"),
        sum("n_tok").cast("long").as("n_tokens_raw"))
      .crossJoin(exactRemoved.agg(count(lit(1)).as("n_exact_removed")))
      .crossJoin(nearRemoved.agg(count(lit(1)).as("n_neardup_removed")))
      .crossJoin(surv.agg(count(lit(1)).as("n_docs_after_dedup")))
      .crossJoin(fin.agg(count(lit(1)).as("n_docs_final"),
        coalesce(sum("n_tok"), lit(0L)).cast("long").as("n_tokens_final")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_funnel" -> pipelineFunnel)

  val oracles: Map[String, String] = {
    import TextQueries._
    Map(
      "pipeline_funnel" ->
        (s"WITH RECURSIVE ${DedupQueries.lshPairsCte},\n" +
          s"""edges AS (SELECT a_id AS src, b_id AS dst FROM lshpairs
            |          UNION SELECT b_id, a_id FROM lshpairs),
            |reach(a, b) AS (
            |  SELECT src, src FROM edges
            |  UNION
            |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
            |comp AS (SELECT a AS doc_id, min(b) AS cluster_id
            |         FROM reach GROUP BY a),
            |ex AS (SELECT doc_id FROM (
            |         SELECT doc_id,
            |           min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
            |         FROM documents)
            |       WHERE doc_id <> keeper),
            |near AS (SELECT doc_id FROM comp
            |         WHERE doc_id <> cluster_id
            |           AND doc_id NOT IN (SELECT doc_id FROM ex)),
            |toks AS (SELECT doc_id,
            |           len(list_filter(string_split(text, ' '), x -> x <> ''))
            |             ::BIGINT AS n_tok
            |         FROM documents),
            |surv AS (SELECT d.doc_id, d.text, t.n_tok
            |         FROM documents d JOIN toks t USING (doc_id)
            |         WHERE d.doc_id NOT IN (SELECT doc_id FROM ex)
            |           AND d.doc_id NOT IN (SELECT doc_id FROM near)),
            |qc AS (SELECT doc_id, n_tok, len(w) AS n_words,
            |         list_sum(list_transform(w, x -> length(x))) AS sum_len,
            |         len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
            |           AS n_alpha,
            |         len(list_filter(w, x -> x IN ($stopListSql))) AS n_stop
            |       FROM (SELECT doc_id, n_tok,
            |               list_filter(string_split(text, ' '), x -> x <> '')
            |                 AS w
            |             FROM surv)
            |       WHERE len(w) >= 1),
            |fin AS (SELECT doc_id, n_tok FROM qc
            |        WHERE n_words BETWEEN $GopherMinWords AND $GopherMaxWords
            |          AND sum_len * 1.0 / n_words >= $GopherMinMeanLen
            |          AND sum_len * 1.0 / n_words <= $GopherMaxMeanLen
            |          AND n_alpha * 1.0 / n_words >= $GopherMinAlphaFrac
            |          AND n_stop >= $GopherMinStopHits)
            |SELECT
            |  (SELECT count(*) FROM documents) AS n_docs_raw,
            |  (SELECT sum(n_tok) FROM toks)::BIGINT AS n_tokens_raw,
            |  (SELECT count(*) FROM ex) AS n_exact_removed,
            |  (SELECT count(*) FROM near) AS n_neardup_removed,
            |  (SELECT count(*) FROM surv) AS n_docs_after_dedup,
            |  (SELECT count(*) FROM fin) AS n_docs_final,
            |  (SELECT coalesce(sum(n_tok), 0) FROM fin)::BIGINT
            |    AS n_tokens_final""".stripMargin))
  }
}
