package graft.sim

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-norm profile — the one-glance health check of an
  * embedding pipeline: the histogram of L2 norms per label. A
  * normalization bug (skipped renorm, fp16 truncation, a mixed-model
  * batch) shows up instantly as a second mode or a shifted bucket,
  * BEFORE any similarity query silently degrades — cosine similarity
  * hides norm drift by construction, which is exactly why the norms
  * deserve their own gate.
  *
  * Exactness: the norm is `sqrt(v·v)` over the engine-standard
  * left-to-right double dot ([[graft.functions.ArrayDot]]); IEEE-754
  * sqrt is correctly rounded in both engines, so the doubles are
  * bit-identical and the 2-decimal bucket rounding lands identically.
  *
  * Scale shape at 100 TB: a zero-shuffle projection (dot + sqrt +
  * round) followed by a (label × occupied-bucket)-bounded rollup with
  * map-side partials — the doc-profile family law on embeddings. */
object NormProfile {

  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ArrayDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def embedNormProfile(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "embeddings")
      .select(col("label"),
        round(sqrt(dot(col("embedding"), col("embedding"))), 2)
          .as("norm_bucket"))
      .groupBy("label", "norm_bucket")
      .agg(count(lit(1)).as("n_vectors"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_norm_profile" -> embedNormProfile)

  val oracles: Map[String, String] = Map(
    "embed_norm_profile" ->
      s"""SELECT label,
        |  round(sqrt(${SimilarityQueries.sqlDot("embedding", "embedding")}), 2)
        |    AS norm_bucket,
        |  count(*)::BIGINT AS n_vectors
        |FROM embeddings GROUP BY 1, 2""".stripMargin)
}
