package graft.text

import graft.Tables
import graft.text.TextQueries.words
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 document ranking (Robertson & Walker 1994; the Okapi weighting
  * behind Lucene/Elasticsearch scoring) — the retrieval tier of a
  * training-data pipeline: score every document against a fixed query
  * term set and keep the top [[TopK]]. The same shape serves corpus
  * search, hard-negative mining next to `negative_pairs`, and
  * quality-weighted sampling by query relevance.
  *
  * Scoring: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * with k1 = [[K1]], b = [[B]]. idf uses the raw Robertson ratio
  * (N−df+0.5)/(df+0.5) WITHOUT the usual log wrap: every operation is
  * then IEEE-754 +,−,×,÷ (each correctly rounded, so bit-identical in
  * any engine that evaluates the same expression tree), which keeps the
  * query inside the exact hash gate — `ln` differs across math libraries
  * in the last ulp and would force a weaker bound-assert oracle. The log
  * is monotone per-term, and swapping it in is a one-line change where
  * score calibration matters more than gate strength.
  *
  * Scale shape: tokens are filtered to the query terms BEFORE the tf
  * shuffle (the grouped relation is |terms|·N_docs at worst, corpus-sized
  * never); df is a |terms|-row aggregate broadcast back; N/avgdl ride a
  * single-row broadcast cross join; per-term columns pivot in one
  * aggregation (fixed-order total — no float-sum reorder across engines);
  * the final top-k is a TakeOrdered, not a global sort.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75
  val TopK = 20

  /** Fixed query — four common terms plus the one rare term in the
    * synthetic vocabulary ("dup", df ≈ 5 %), so idf actually spreads. */
  val QueryTerms: Seq[String] = Seq("dup", "spark", "window", "merge", "scan")

  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25(Tables.parallel(s, dir, "documents"))

  /** Corpus statistics a scorer needs: per-term document frequencies,
    * document count, total document length. [[bm25]] computes them
    * inline; [[graft.streaming.StreamBm25]] freezes them. */
  final case class CorpusStats(df: Map[String, Long], nDocs: Long, sumDl: Long)

  /** THE BM25 score expression — the single tree both the batch pivot
    * (join/aggregate Columns) and the frozen-stats streaming scorer
    * (literal Columns) instantiate, so their doubles are bit-identical
    * by construction, not by manual mirroring. Mirrors the oracle SQL
    * operation-for-operation; see [[oracles]]. */
  def scoreExpr(tf: Column, df: Column, dl: Column,
                nDocs: Column, sumDl: Column): Column = {
    val avgdl = sumDl.cast("double") / nDocs
    val idf = (nDocs - df + lit(0.5)) / (df + lit(0.5))
    val norm = lit(K1) * (lit(1 - B) + (lit(B) * dl) / avgdl)
    (idf * (tf * lit(K1 + 1))) / (tf + norm)
  }

  /** Train (collect) the frozen stats [[graft.streaming.StreamBm25]]
    * scores against — the same relations [[bm25]] broadcasts inline. */
  def trainStats(docs: DataFrame): CorpusStats = {
    val d = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .withColumn("dl", size(col("w")))
    val Array(st) = d.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("sum_dl")).collect()
    // sum() over zero rows is null — fail here with the clean message,
    // not an opaque NPE at getLong
    require(st.getLong(0) > 0, "empty training corpus")
    val dfRows = d
      .select(col("doc_id"), explode(col("w")).as("t"))
      .filter(col("t").isin(QueryTerms: _*))
      .select(col("doc_id"), col("t")).distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
      .collect()
    CorpusStats(
      dfRows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      st.getLong(0), st.getLong(1))
  }

  /** Scored relation `(doc_id, dl, s_<term>…, total)` with EXACT doubles,
    * before the top-k cut — the surface [[bm25]] rounds for its gate and
    * [[HybridRetrieval]] ranks for rank fusion. */
  def scored(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .withColumn("dl", size(col("w")))
    // Single-row corpus stats; broadcast so the cross join is map-side.
    val stats = d.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("sum_dl"))
    val tf = d
      .select(col("doc_id"), col("dl"), explode(col("w")).as("t"))
      .filter(col("t").isin(QueryTerms: _*))
      .groupBy("doc_id", "dl", "t")
      .agg(count(lit(1)).as("tf"))
      // read twice (df model + score join) — materialize the term-bounded
      // relation once instead of re-tokenizing the corpus per consumer
      .localCheckpoint(true)
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val sc = tf
      .join(broadcast(df), "t")
      .crossJoin(broadcast(stats))
      .withColumn("s", scoreExpr(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("sum_dl")))
    def termCol(t: String): Column =
      coalesce(max(when(col("t") === t, col("s"))), lit(0.0)).as(s"s_$t")
    val aggCols = max(col("dl")).cast("long").as("dl") +: QueryTerms.map(termCol)
    val pivoted = sc.groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
    val total = QueryTerms.map(t => col(s"s_$t")).reduceLeft(_ + _)
    pivoted.withColumn("total", total)
  }

  /** Core ranking over any `(doc_id, text)` relation — the gate query
    * binds it to the `documents` table; specs feed hand-built corpora. */
  def bm25(docs: DataFrame): DataFrame =
    scored(docs)
      .orderBy(col("total").desc, col("doc_id").asc)
      .limit(TopK)
      .select(Seq(col("doc_id"), col("dl")) ++
        QueryTerms.map(t => round(col(s"s_$t"), 4).as(s"s_$t")) :+
        round(col("total"), 4).as("score"): _*)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> bm25TopK)

  /** Shared oracle CTE chain ending in `p(doc_id, dl, s_<term>…)` —
    * operation-for-operation mirror of [[scored]]; reused by
    * [[HybridRetrieval.oracles]] for the lexical ranking side. */
  private[text] val scoredCtes: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    val termCols = QueryTerms.map(t =>
      s"coalesce(max(CASE WHEN t = '$t' THEN s END), 0.0) AS s_$t")
      .mkString(",\n  ")
    s"""WITH d AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |dd AS (SELECT doc_id, len(w) AS dl, w FROM d),
      |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, t, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(w) AS t FROM dd)
      |  WHERE t IN ($terms)
      |  GROUP BY doc_id, dl, t),
      |idf AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
      |sc AS (
      |  SELECT doc_id,
      |    (((n_docs - df) + 0.5e0) / (df + 0.5e0)
      |      * (tf * ${K1 + 1}e0)) / (tf + ${K1}e0 * ((${1 - B}e0) + (${B}e0 * dl) / (sum_dl::DOUBLE / n_docs))) AS s,
      |    t, dl
      |  FROM tf JOIN idf USING (t) CROSS JOIN st),
      |p AS (
      |  SELECT doc_id, max(dl) AS dl,
      |  $termCols
      |  FROM sc GROUP BY doc_id)""".stripMargin
  }

  private[text] val totalExpr = QueryTerms.map(t => s"s_$t").mkString(" + ")

  val oracles: Map[String, String] = {
    val roundCols = QueryTerms.map(t => s"round(s_$t, 4) AS s_$t")
      .mkString(", ")
    Map(
      "bm25_topk" ->
        s"""$scoredCtes
          |SELECT doc_id, dl, $roundCols, round($totalExpr, 4) AS score
          |FROM p ORDER BY $totalExpr DESC, doc_id ASC LIMIT $TopK"""
          .stripMargin)
  }
}
