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

  /** Dataset card — the one-row corpus report a training-data release
    * publishes (size, composition balance, duplication, quality pass
    * rate; cf. the "datasheets for datasets" practice): every number
    * composes an operator the standalone gates already prove
    * ([[graft.dedup.DedupQueries.dedupExact]]'s dup accounting,
    * [[TextQueries.gopherFlags]]' rule set), so the card cannot drift
    * from its parts. Shares are integer-ratio doubles rounded once —
    * exact cross-engine. Scale: two doc-keyed aggregations (content
    * hash distinct, per-source/lang partials) + scan-shaped quality
    * flags; everything after is sources-sized. */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        size(TextQueries.words(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chr"))
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").cast("long").as("n_tokens"),
      sum("n_chr").cast("long").as("n_chars"))
    // distinct-source/lang counts ride the per-key aggregates below
    // rather than a dual count(DISTINCT …) in `base`: the
    // RewriteDistinctAggregates Expand would triple the scanned rows AND
    // its group order follows attribute exprIds, which drift with
    // session history — a nondeterministic plan string under the lock
    val src = docs.groupBy("source").agg(count(lit(1)).as("c"))
      .agg(max("c").as("max_src_docs"), count(lit(1)).as("n_sources"))
    val lng = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(max("c").as("max_lang_docs"), count(lit(1)).as("n_langs"))
    val dup = DedupQueries.dedupExact(s, dir).select(col("n_dup_docs"))
    val gp = TextQueries.gopherFlags(docs).filter(col("pass"))
      .agg(count(lit(1)).as("n_gopher_pass"))
    base.crossJoin(src).crossJoin(lng).crossJoin(dup).crossJoin(gp)
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_sources"), col("n_langs"),
        round(col("max_src_docs") / col("n_docs"), 4).as("max_source_share"),
        round(col("max_lang_docs") / col("n_docs"), 4).as("max_lang_share"),
        round(col("n_dup_docs") / col("n_docs"), 4).as("exact_dup_rate"),
        round(col("n_gopher_pass") / col("n_docs"), 4).as("gopher_pass_rate"),
        round(col("n_tokens") / col("n_docs"), 4).as("mean_doc_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_funnel" -> pipelineFunnel,
    "dataset_card" -> datasetCard)

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
            |    AS n_tokens_final""".stripMargin),
      "dataset_card" ->
        (s"WITH $wordsCte,\n" +
          s"""base AS (SELECT count(*) AS n_docs,
            |    sum(len(w))::BIGINT AS n_tokens,
            |    sum(length(text))::BIGINT AS n_chars,
            |    count(DISTINCT source) AS n_sources,
            |    count(DISTINCT lang) AS n_langs
            |  FROM w),
            |src AS (SELECT max(c) AS max_src_docs FROM
            |  (SELECT count(*) AS c FROM documents GROUP BY source)),
            |lng AS (SELECT max(c) AS max_lang_docs FROM
            |  (SELECT count(*) AS c FROM documents GROUP BY lang)),
            |dup AS (SELECT (sum(c) - count(*))::BIGINT AS n_dup_docs FROM
            |  (SELECT count(*) AS c FROM documents GROUP BY sha256(text))),
            |qc AS (SELECT len(w) AS n_words,
            |    list_sum(list_transform(w, x -> length(x))) AS sum_len,
            |    len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
            |      AS n_alpha,
            |    len(list_filter(w, x -> x IN ($stopListSql))) AS n_stop
            |  FROM w WHERE len(w) >= 1),
            |gp AS (SELECT count(*) AS n_gopher_pass FROM qc
            |  WHERE n_words BETWEEN $GopherMinWords AND $GopherMaxWords
            |    AND sum_len * 1.0 / n_words >= $GopherMinMeanLen
            |    AND sum_len * 1.0 / n_words <= $GopherMaxMeanLen
            |    AND n_alpha * 1.0 / n_words >= $GopherMinAlphaFrac
            |    AND n_stop >= $GopherMinStopHits)
            |SELECT n_docs, n_tokens, n_chars, n_sources, n_langs,
            |  round(max_src_docs * 1.0 / n_docs, 4) AS max_source_share,
            |  round(max_lang_docs * 1.0 / n_docs, 4) AS max_lang_share,
            |  round(n_dup_docs * 1.0 / n_docs, 4) AS exact_dup_rate,
            |  round(n_gopher_pass * 1.0 / n_docs, 4) AS gopher_pass_rate,
            |  round(n_tokens * 1.0 / n_docs, 4) AS mean_doc_tokens
            |FROM base, src, lng, dup, gp""".stripMargin))
  }
}
