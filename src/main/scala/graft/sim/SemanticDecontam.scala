package graft.sim

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic decontamination — the embedding-space leg of the
  * decontamination family: flag training vectors whose cosine to ANY
  * held-out eval vector exceeds a threshold. Catches paraphrased or
  * re-formatted eval leakage the exact-shingle pass
  * ([[graft.dedup.DedupQueries.decontaminate]]) cannot see — the two
  * passes together are the standard train/test hygiene pair (surface
  * overlap + semantic overlap).
  *
  * Scale shape: the eval side is tiny by construction and rides a
  * BROADCAST, so the corpus is scanned once with zero shuffle for the
  * match; the per-corpus-vector aggregate (hits, max cosine) is a
  * map-side partial over the broadcast fan-out. Same shape as
  * `decontaminate` (broadcast eval shingles) and `ann_batch_topk`
  * (broadcast query batch). At 100 TB the eval set still fits in one
  * broadcast (eval suites are MBs, not TBs).
  */
object SemanticDecontam {

  /** Production threshold: the TRUE near-dup regime (RecallProbe:
    * bucket recall there is 1.0, so an LSH prefilter would be
    * admissible; the exact broadcast scan needs no recall argument at
    * all). The fixture embeddings' planted dups never cross the eval
    * boundary (max eval↔corpus cosine ≈ 0.49), so the GATE binds
    * [[GateContamCos]] — the `dedup_embedding_cosine` verify bound — to
    * exercise a non-empty relation (2/6/42 flagged vectors at
    * sf0.001/0.01/0.1); same gate-vs-production split as
    * `GateResizeMaxEdge`. The PRODUCTION threshold is exercised by
    * [[decontamSemanticStrict]] over a derived-paraphrase eval set. */
  val ContamCos = 0.95
  val GateContamCos = 0.4

  /** Eval stand-in: every [[EvalMod]]-th vector (mirrors the drop-list
    * convention of the shingle pass: a small, deterministic eval set). */
  val EvalMod = 50

  def decontamSemantic(s: SparkSession, dir: String): DataFrame =
    decontamOver(Tables.parallel(s, dir, "embeddings"), GateContamCos)

  def decontamSemantic(s: SparkSession, dir: String, threshold: Double)
      : DataFrame =
    decontamOver(Tables.parallel(s, dir, "embeddings"), threshold)

  /** Core pass over any `(vec_id, embedding)` relation. */
  def decontamOver(e: DataFrame, threshold: Double): DataFrame = {
    import SimilarityQueries.dot
    val eval = e.filter(col("vec_id") % EvalMod === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev"),
        sqrt(dot(col("embedding"), col("embedding"))).as("en"))
    e.filter(col("vec_id") % EvalMod =!= 0)
      .crossJoin(broadcast(eval))
      .select(col("vec_id"), col("eval_id"),
        (dot(col("embedding"), col("ev")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("en")))
          .as("cos"))
      .groupBy("vec_id")
      .agg(
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_eval_hits"),
        round(max(col("cos")), 4).as("max_cosine"))
      .filter(col("n_eval_hits") > 0)
  }

  /** Deterministic "paraphrase" displacement for the strict gate's
    * derived eval set: ev = v + δ·e₁. For unit-norm v the cosine to its
    * source is (1 + δ·v₁)/√(1 + 2δ·v₁ + δ²) ≥ 1/√(1+δ²) = 0.970 at
    * δ = 0.25 — always above [[ContamCos]], for every v. */
  val ParaphraseDelta = 0.25

  /** PRODUCTION-threshold gate (round-7 verdict #3: [[ContamCos]] had
    * never been exercised by any gate — the fixture embeddings carry no
    * cross-eval-boundary pair above cosine ≈ 0.49). Models the actual
    * contamination event: an eval item that is a light paraphrase of a
    * TRAINING document. The eval side derives from the corpus itself —
    * every [[EvalMod]]-th vector displaced by [[ParaphraseDelta]]·e₁
    * (the phash-gate playbook: plant from existing structure so every
    * SF carries it) — and the scan covers the FULL corpus (production
    * decontaminates the whole training set against the eval suite; the
    * gate variant's %-split exclusion exists only to fake a disjoint
    * eval set). Each source vector is guaranteed ≥ 0.970 to its own
    * paraphrase, so the 0.95 relation is non-empty at every SF; near-dups
    * of a source may legitimately cross too. Same broadcast-eval,
    * zero-shuffle scan shape as [[decontamSemantic]]. */
  def decontamSemanticStrict(s: SparkSession, dir: String): DataFrame = {
    import SimilarityQueries.dot
    val e = Tables.parallel(s, dir, "embeddings")
    val eval = e.filter(col("vec_id") % EvalMod === 0)
      .select(col("vec_id").as("eval_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") + lit(ParaphraseDelta))
            .otherwise(x.cast("double"))).as("ev"))
      .withColumn("en", sqrt(dot(col("ev"), col("ev"))))
    e.crossJoin(broadcast(eval))
      .select(col("vec_id"), col("eval_id"),
        (dot(col("embedding"), col("ev")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("en")))
          .as("cos"))
      .groupBy("vec_id")
      .agg(
        sum(when(col("cos") >= ContamCos, 1L).otherwise(0L)).as("n_eval_hits"),
        round(max(col("cos")), 4).as("max_cosine"))
      .filter(col("n_eval_hits") > 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontam_semantic" -> decontamSemantic,
    "decontam_semantic_strict" -> decontamSemanticStrict)

  val oracles: Map[String, String] = {
    val dotEv = SimilarityQueries.sqlDot("e.embedding", "v.ev")
    val selfE = SimilarityQueries.sqlDot("e.embedding", "e.embedding")
    Map(
      "decontam_semantic" ->
        s"""WITH ev AS (
          |  SELECT vec_id AS eval_id, embedding AS ev,
          |    sqrt(${SimilarityQueries.sqlDot("embedding", "embedding")}) AS en
          |  FROM embeddings WHERE vec_id % $EvalMod = 0),
          |sc AS (
          |  SELECT e.vec_id,
          |    $dotEv / (sqrt($selfE) * v.en) AS cos
          |  FROM embeddings e CROSS JOIN ev v
          |  WHERE e.vec_id % $EvalMod <> 0)
          |SELECT vec_id,
          |  sum(CASE WHEN cos >= $GateContamCos THEN 1 ELSE 0 END)::BIGINT
          |    AS n_eval_hits,
          |  round(max(cos), 4) AS max_cosine
          |FROM sc GROUP BY vec_id
          |HAVING sum(CASE WHEN cos >= $GateContamCos THEN 1 ELSE 0 END) > 0"""
          .stripMargin,
      "decontam_semantic_strict" -> {
        val dotEvS = SimilarityQueries.sqlDot("e.embedding", "v.ev")
        val evSelf = SimilarityQueries.sqlDot("ev", "ev")
        s"""WITH evp AS (
          |  SELECT vec_id AS eval_id,
          |    list_transform(embedding, (x, i) -> CASE WHEN i = 1
          |      THEN CAST(x AS DOUBLE) + $ParaphraseDelta
          |      ELSE CAST(x AS DOUBLE) END) AS ev
          |  FROM embeddings WHERE vec_id % $EvalMod = 0),
          |ev AS (SELECT eval_id, ev, sqrt($evSelf) AS en FROM evp),
          |sc AS (
          |  SELECT e.vec_id,
          |    $dotEvS / (sqrt($selfE) * v.en) AS cos
          |  FROM embeddings e CROSS JOIN ev v)
          |SELECT vec_id,
          |  sum(CASE WHEN cos >= $ContamCos THEN 1 ELSE 0 END)::BIGINT
          |    AS n_eval_hits,
          |  round(max(cos), 4) AS max_cosine
          |FROM sc GROUP BY vec_id
          |HAVING sum(CASE WHEN cos >= $ContamCos THEN 1 ELSE 0 END) > 0"""
          .stripMargin
      })
  }
}
