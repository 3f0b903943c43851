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
    * `GateResizeMaxEdge`. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontam_semantic" -> decontamSemantic)

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
          .stripMargin)
  }
}
