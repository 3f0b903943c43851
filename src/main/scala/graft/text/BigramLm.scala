package graft.text

import graft.Tables
import graft.text.TextQueries.{words, wordsCte}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram language-model quality score — the step past [[TextQueries
  * .qualityLmScore]]'s unigram filter toward the n-gram KenLM CCNet
  * actually trains: score each document by its mean TRANSITION surprisal
  * under corpus bigram statistics, so word-salad that passes a unigram
  * filter (every token common, order scrambled) finally fails. Same
  * integer-exact discipline as the unigram scorer: a seen transition
  * (w1, w2) costs `length(bin(c1 div c2))` bits — the bit-length of the
  * inverse conditional frequency c2/c1 — and an unseen one backs off to
  * the maximum `length(bin(T))` (count 1 against all T transitions), so
  * no transcendental enters the score and the oracle matches
  * hash-exactly.
  *
  * Scale shape (the unigram scorer's, one derivation deeper): the
  * transition stream is a per-row adjacent-pair explode (no shuffle to
  * build); the model is the top-[[BigramK]] transitions WITH their
  * context counts — vocab²-bounded, HINTED broadcast — plus a broadcast
  * single-row total; scoring is one left join + a partial-aggregated
  * mean keyed by doc_id. Training is two aggregations over the
  * transition stream (c2 pair counts, c1 context counts), both
  * vocab-bounded outputs.
  */
object BigramLm {

  /** Top-K bigram model size. 256 of the synthetic corpus's ≤ 31² ≈ 961
    * observed transitions keeps BOTH the seen and backoff paths hot at
    * every fixture SF; a production corpus dials this to 10⁶⁺ and the
    * broadcast stays a few MB. */
  val BigramK = 256

  /** Grade bands on mean bits/transition (seen ≈ 5–6 bits on the
    * synthetic corpus, backoff ≈ log2(T)): mostly-seen transitions read
    * "natural", mostly-backoff "synthetic". */
  val NaturalMax = 10.0
  val MixedMax = 14.0

  private val pairsExpr = expr(
    """transform(sequence(1, size(w) - 1),
      |  i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"""
      .stripMargin)

  def qualityBigramScore(s: SparkSession, dir: String): DataFrame =
    scored(Tables(s, dir, "documents"), BigramK)

  /** Per-document transition stream of a `(doc_id, text)` relation. */
  def transitions(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(pairsExpr).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Top-`k` transition model `(w1, w2, c2, c1)` of a transition stream.
    * c1 and the [[trainModel]] total are DERIVED from the pair counts
    * (c1(w1) = Σ_w2 c2, T = Σ c2) instead of re-aggregating the
    * transition explode, so training costs one corpus scan, not three. */
  def modelDf(tr: DataFrame, k: Int): DataFrame = {
    val c2 = tr.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    c2.join(c1, "w1")
      .orderBy(desc("c2"), asc("w1"), asc("w2"))
      .limit(k)
  }

  /** Freeze a model for [[graft.streaming.StreamBigram]]: the SAME
    * relations [[scored]] plans, collected — (model map, transition
    * total) — so batch and stream can never train differently. */
  def trainModel(docs: DataFrame, k: Int): (Map[(String, String), (Long, Long)], Long) = {
    val tr = transitions(docs)
    val c2 = tr.groupBy("w1", "w2").agg(count(lit(1)).as("c2")).cache()
    try {
      val trow = c2.agg(sum(col("c2"))).collect()(0)
      // sum over zero rows is null — empty corpus trains an empty model
      if (trow.isNullAt(0)) return (Map.empty, 0L)
      val t = trow.getLong(0)
      val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
      val model = c2.join(c1, "w1")
        .orderBy(desc("c2"), asc("w1"), asc("w2")).limit(k)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      (model, t)
    } finally c2.unpersist()
  }

  /** Core scorer over any `(doc_id, text)` relation at an explicit model
    * size — the gate binds the `documents` table and [[BigramK]]; the
    * spec shrinks `k` so the backoff path is provable on a hand corpus. */
  def scored(docs: DataFrame, k: Int): DataFrame = {
    val tr = transitions(docs)
    // ONE materialized pair-count relation (transition-vocab-bounded)
    // serves the model AND the total: the transition explode previously
    // re-ran for each (3 corpus passes → 2)
    val c2m = tr.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2m.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val model = c2m.join(c1, "w1")
      .orderBy(desc("c2"), asc("w1"), asc("w2"))
      .limit(k)
    val total = c2m.agg(sum(col("c2")).as("t"))
    tr.join(broadcast(model), Seq("w1", "w2"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        when(col("c2").isNotNull, length(bin(expr("c1 div c2"))))
          .otherwise(length(bin(col("t")))).as("surp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"),
        round(avg("surp"), 4).as("bg_score"))
      .withColumn("grade",
        when(col("bg_score") <= NaturalMax, "natural")
          .when(col("bg_score") <= MixedMax, "mixed")
          .otherwise("synthetic"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_bigram_score" -> qualityBigramScore)

  val oracles: Map[String, String] = Map(
    "quality_bigram_score" ->
      (s"WITH $wordsCte,\n" +
        s"""tr AS (
          |  SELECT doc_id,
          |    unnest(list_transform(range(1, len(w)),
          |      i -> {'w1': w[i], 'w2': w[i + 1]})) AS p
          |  FROM w WHERE len(w) >= 2),
          |t2 AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM tr),
          |c2 AS (SELECT w1, w2, count(*) AS c2 FROM t2 GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM t2 GROUP BY 1),
          |tot AS (SELECT count(*) AS t FROM t2),
          |model AS (
          |  SELECT c2.w1, c2.w2, c2.c2, c1.c1 FROM c2 JOIN c1 USING (w1)
          |  ORDER BY c2.c2 DESC, c2.w1 ASC, c2.w2 ASC LIMIT $BigramK),
          |sc AS (
          |  SELECT t2.doc_id,
          |    CASE WHEN m.c2 IS NOT NULL THEN length(bin(m.c1 // m.c2))
          |         ELSE length(bin((SELECT t FROM tot))) END AS surp
          |  FROM t2 LEFT JOIN model m USING (w1, w2)),
          |g AS (
          |  SELECT doc_id, count(*) AS n_trans,
          |    round(avg(surp), 4) AS bg_score
          |  FROM sc GROUP BY doc_id)
          |SELECT doc_id, n_trans, bg_score,
          |  CASE WHEN bg_score <= $NaturalMax THEN 'natural'
          |       WHEN bg_score <= $MixedMax THEN 'mixed'
          |       ELSE 'synthetic' END AS grade
          |FROM g""".stripMargin))
}
