package graft.text

import graft.Tables
import graft.sim.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval via Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher 2009): fuse the BM25 top-[[ListDepth]]
  * list with the embedding-cosine top-[[ListDepth]] list by
  * `score(d) = Σ_lists 1 / (k + rank_d)`, k = [[RrfK]] — the standard
  * two-retriever fusion behind "hybrid search" in RAG stacks, keying on
  * ranks so the incomparable score scales (BM25 vs cosine) never meet.
  *
  * Exactness: ranks are integers; each contribution `1/(k+r)` is one
  * IEEE division and the fusion one addition, mirrored
  * operation-for-operation in the oracle, so the gate stays hash-exact.
  *
  * Scale shape: each list is cut to [[ListDepth]] with TakeOrdered (heap
  * top-k, never a global sort) BEFORE ranking, so the rank window and the
  * full-outer fusion join run on two CONSTANT-size (≤ ListDepth)
  * relations — the single-partition window and the join exchange move
  * ≤ 2·ListDepth rows regardless of corpus size. Upstream costs are the
  * proven bm25_topk (matching-token-bounded) and ann_cosine_topk
  * (broadcast-query) shapes.
  */
object HybridRetrieval {

  /** Standard RRF dampening constant (Cormack et al. use 60). */
  val RrfK = 60

  /** Per-retriever candidate list depth. */
  val ListDepth = 20

  /** Fused results kept. */
  val TopK = 10

  /** The vector-side query: same broadcast-query shape (and query id) as
    * `ann_cosine_topk`. */
  val QueryVecId = 0L

  def hybridRrfTopk(s: SparkSession, dir: String): DataFrame = {
    // Lexical list: exact BM25 totals, heap-cut to ListDepth, then ranked
    // within the 20-row result (the window sees a constant-size input).
    val lexOrder = Seq(col("total").desc, col("doc_id").asc)
    val lex = Retrieval.scored(Tables.parallel(s, dir, "documents"))
      .orderBy(lexOrder: _*)
      .limit(ListDepth)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(lexOrder: _*)))
      .select(col("doc_id").as("id"), col("lex_rank"))

    // Vector list: exact cosine vs the broadcast query vector (the
    // ann_cosine_topk shape), heap-cut, then ranked.
    val e = Tables.parallel(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("qe"))
    val cos = SimilarityQueries.dot(col("embedding"), col("qe")) /
      (sqrt(SimilarityQueries.dot(col("embedding"), col("embedding"))) *
        sqrt(SimilarityQueries.dot(col("qe"), col("qe"))))
    val vecOrder = Seq(col("cos").desc, col("vec_id").asc)
    val vec = e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos", cos)
      .orderBy(vecOrder: _*)
      .limit(ListDepth)
      .withColumn("vec_rank",
        row_number().over(Window.orderBy(vecOrder: _*)))
      .select(col("vec_id").as("id"), col("vec_rank"))

    def contrib(rank: String) =
      coalesce(lit(1.0) / (lit(RrfK) + col(rank)), lit(0.0))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("lex_rank"), col("vec_rank"),
        (contrib("lex_rank") + contrib("vec_rank")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_rrf_topk" -> hybridRrfTopk)

  val oracles: Map[String, String] = Map(
    "hybrid_rrf_topk" -> {
      val dot = SimilarityQueries.sqlDot("embedding", "qe")
      val selfDot = SimilarityQueries.sqlDot("embedding", "embedding")
      val qDot = SimilarityQueries.sqlDot("qe", "qe")
      s"""${Retrieval.scoredCtes},
        |lexall AS (
        |  SELECT doc_id, ${Retrieval.totalExpr} AS total FROM p),
        |lex AS (
        |  SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY total DESC, doc_id ASC) AS lex_rank
        |  FROM lexall ORDER BY total DESC, doc_id ASC LIMIT $ListDepth),
        |q AS (SELECT embedding AS qe FROM embeddings
        |      WHERE vec_id = $QueryVecId),
        |vd AS (
        |  SELECT vec_id,
        |    $dot / (sqrt($selfDot) * sqrt($qDot)) AS cos
        |  FROM embeddings, q WHERE vec_id <> $QueryVecId),
        |vec AS (
        |  SELECT vec_id AS id,
        |    row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS vec_rank
        |  FROM vd ORDER BY cos DESC, vec_id ASC LIMIT $ListDepth)
        |SELECT coalesce(lex.id, vec.id) AS doc_id, lex_rank, vec_rank,
        |  coalesce(1e0 / ($RrfK + lex_rank), 0e0)
        |    + coalesce(1e0 / ($RrfK + vec_rank), 0e0) AS rrf_score
        |FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
        |ORDER BY rrf_score DESC, doc_id ASC LIMIT $TopK""".stripMargin
    })
}
