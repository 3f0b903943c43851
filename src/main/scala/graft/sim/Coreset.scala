package graft.sim

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection over the embedding corpus — the
  * farthest-point traversal (Gonzalez 1985; the "k-Center-Greedy"
  * active/core-set selection of Sener & Savarese 2018): starting from a
  * deterministic seed, repeatedly pick the vector farthest (squared L2)
  * from everything already chosen. The k survivors are a provable
  * 2-approximation of the optimal k-center cover — the
  * diversity-maximizing subset a curation pipeline samples when it
  * wants COVERAGE of embedding space rather than [[SemDedup]]'s
  * redundancy removal (the two are complements: SemDeDup trims dense
  * clusters, the coreset guarantees sparse regions keep a
  * representative).
  *
  * Determinism: distances are the engine-standard left-to-right double
  * dot products ([[graft.functions.ArrayDot]] — bit-identical to the
  * DuckDB `list_sum(list_transform(...))` the ANN gates already bind),
  * composed as `(v·v − 2·v·c) + c·c` in a fixed operation order; each
  * round's argmax breaks ties by minimum `vec_id` (TakeOrdered by
  * `(d DESC, vec_id ASC)` — a total order). The oracle replays the
  * ENTIRE greedy selection as unrolled CTEs, so a single ulp of drift
  * anywhere in the chain reds the gate.
  *
  * Scale shape at 100 TB: K corpus scans, each a zero-shuffle
  * projection + a TakeOrdered(1) (partials are 1 row per partition);
  * the center state is K·dim floats on the driver — model-bounded, the
  * [[graft.text.Bpe]] `learn_bpe` split. No pairwise anything: the
  * classic distributed farthest-point shape. */
object Coreset {

  val K = 8

  /** Left-to-right double dot of a float vector against itself, on the
    * driver — bit-identical to ArrayDot / DuckDB list_sum over the same
    * values (same accumulation order). */
  private def selfDot(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    s
  }

  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ArrayDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Squared L2 to a frozen center: `(v·v − 2·v·c) + c·c` — the exact
    * operation order the oracle SQL parses to. */
  private def dist2(v: Column, center: Array[Float]): Column =
    dot(v, v) - lit(2.0) * dot(v, typedlit(center.toSeq)) +
      lit(selfDot(center))

  /** The K greedy centers: (rank, vec_id, sep) where `sep` is the
    * selection distance (max-min squared L2 to all earlier centers;
    * 0.0 for the seed, which is the minimum vec_id). */
  def coresetKcenter(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.parallel(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val seed = emb.orderBy(asc("vec_id")).limit(1).collect()(0)
    var centers = Vector[(Long, Long, Double)](
      (1L, seed.getLong(0), 0.0))
    var cur = emb.withColumn("d",
      dist2(col("embedding"), vecOf(seed)))
    for (rank <- 2 to K) {
      val top = cur.orderBy(desc("d"), asc("vec_id")).limit(1).collect()(0)
      centers :+= ((rank.toLong, top.getLong(0), top.getDouble(2)))
      if (rank < K)
        cur = cur.withColumn("d",
          least(col("d"), dist2(col("embedding"), vecOf(top))))
    }
    import s.implicits._
    centers.toDF("rank", "vec_id", "sep")
  }

  private def vecOf(r: org.apache.spark.sql.Row): Array[Float] =
    r.getSeq[Float](1).toArray

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "coreset_kcenter" -> coresetKcenter)

  val oracles: Map[String, String] = {
    import SimilarityQueries.sqlDot
    def d2(e: String, c: String): String =
      s"${sqlDot(s"$e.embedding", s"$e.embedding")} - 2.0 * " +
        s"${sqlDot(s"$e.embedding", s"$c.embedding")} + " +
        sqlDot(s"$c.embedding", s"$c.embedding")
    // round i: min-dist including center i−1, then argmax → center i
    val rounds = (2 to K).map { i =>
      val prevD =
        if (i == 2) d2("e", s"c${i - 2}")
        else s"least(e.d, ${d2("e", s"c${i - 2}")})"
      s"""m${i - 1} AS (
        |  SELECT e.vec_id, e.embedding, $prevD AS d
        |  FROM ${if (i == 2) "emb" else s"m${i - 2}"} e CROSS JOIN c${i - 2}),
        |c${i - 1} AS (
        |  SELECT vec_id, embedding, d FROM m${i - 1}
        |  ORDER BY d DESC, vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val sel = (2 to K).map(i =>
      s"SELECT ${i}::BIGINT AS rank, vec_id, d AS sep FROM c${i - 1}")
      .mkString("\nUNION ALL ")
    Map(
      "coreset_kcenter" ->
        s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
          |c0 AS (SELECT vec_id, embedding FROM emb
          |       ORDER BY vec_id ASC LIMIT 1),
          |$rounds
          |SELECT 1::BIGINT AS rank, vec_id, 0.0 AS sep FROM c0
          |UNION ALL $sel""".stripMargin)
  }
}
