package graft.sim

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank centrality over the kNN graph (Brin & Page 1998) — the graph
  * signal a curation pipeline derives once the neighbor structure exists:
  * vectors that many other vectors count among their nearest neighbors
  * are hubs of their semantic region (dense-cluster cores rank high,
  * outliers rank low), a selection/weighting signal next to SemDeDup's
  * keeper rule and the quality filters.
  *
  * Exactness: the power iteration runs in FIXED-POINT integer arithmetic
  * (1.0 ≡ [[Scale]]): per-node contribution `r div outdeg`, damped update
  * `base + (85 · Σ contrib) div 100`. Every operation is integer
  * multiply/divide/sum — no float accumulation order to drift — so the
  * DuckDB oracle (the same [[Iterations]] unrolled as CTEs) reproduces
  * every rank bit-for-bit. Truncation loss vs real-valued PR is ≤ 1 ulp
  * of 1e-12 per division — irrelevant for ranking, decisive for the
  * cross-engine hash gate.
  *
  * Scale shape: one iteration = join ranks(N) × edges(N·K) on src, one
  * partial-aggregated sum keyed by dst, one left join back to nodes —
  * shuffle ∝ edges per iteration, a constant number of iterations. The
  * edge+degree relation is built once and cached; at 100 TB this is the
  * canonical iterative-join batch shape (each iteration AQE-planned,
  * no driver-side graph state). Dangling mass (nodes without out-edges)
  * evaporates, as in the simplified PR formulation — mirrored in SQL. */
object PageRank {

  /** Fixed-point scale: 1.0 ≡ 1e12 (Σ initial ranks = Scale). */
  val Scale = 1000000000000L

  /** Damping d = 85/100, applied as integer multiply-then-divide. */
  val DampNum = 85L
  val DampDen = 100L

  val Iterations = 5
  val TopK = 20

  /** Core iteration over any `(id)` node / `(src, dst)` edge relation.
    * `n` is the node count (the caller owns that single scalar). */
  def pagerankFp(nodes: DataFrame, edges: DataFrame, n: Long,
                 iterations: Int = Iterations): DataFrame = {
    require(n > 0, "empty node set")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    // materialize the degree-weighted edge relation ONCE, keeping the
    // join's src hash-partitioning (localCheckpoint preserves physical
    // partitioning): the lazy fold otherwise re-runs the degree
    // aggregation + join and re-exchanges the edge side in EVERY
    // iteration (guide §2.4 — establish the partitioning once)
    val ed = edges.join(deg, "src").localCheckpoint(true)
    val base = (15L * Scale) / (100L * n)
    val r0 = nodes.select(col("id"), lit(Scale / n).as("r"))
    (1 to iterations).foldLeft(r0) { (r, _) =>
      val contrib = r.join(ed, col("id") === col("src"))
        .select(col("dst").as("cid"), expr("r div d").as("c"))
        .groupBy("cid").agg(sum("c").as("csum"))
      nodes.select(col("id"))
        .join(contrib, col("id") === col("cid"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($DampNum * coalesce(csum, 0)) div $DampDen")).as("r"))
    }
  }

  /** Gate query: top-[[TopK]] hubs of the kNN graph by fixed-point rank.
    * The edge list is the `knn_graph_lsh` relation (cached once — five
    * iterations re-read it); nodes are ALL vectors, so isolated vectors
    * keep the base rank. */
  def pagerankKnn(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.parallel(s, dir, "embeddings")
      .select(col("vec_id").as("id"))
    val n = nodes.count()
    val edges = SimilarityQueries.knnGraphLshShared(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    pagerankFp(nodes, edges, n)
      .orderBy(desc("r"), asc("id"))
      .limit(TopK)
      .select(col("id").as("vec_id"), col("r").as("rank_fp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank_knn" -> pagerankKnn)

  val oracles: Map[String, String] = {
    // the knn edge relation, then the SAME fixed-point update unrolled
    // Iterations times; // on non-negative BIGINTs == Spark's `div`
    val iterCtes = (1 to Iterations).map { i =>
      s"""r$i AS (
        |  SELECT nn.id,
        |    (bs.base + (${DampNum} * coalesce(c.csum, 0)) // ${DampDen})::BIGINT AS r
        |  FROM nn CROSS JOIN bs
        |  LEFT JOIN (
        |    SELECT eg.dst AS id, (sum(p.r // dg.d))::BIGINT AS csum
        |    FROM r${i - 1} p
        |    JOIN dg ON p.id = dg.src
        |    JOIN eg ON eg.src = p.id
        |    GROUP BY eg.dst) c USING (id))""".stripMargin
    }.mkString(",\n")
    Map(
      "pagerank_knn" ->
        s"""WITH b AS (SELECT vec_id, embedding,
          |    ${SimilarityQueries.sqlBucket("embedding")} AS bucket
          |  FROM embeddings),
          |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          |    ${SimilarityQueries.sqlDot("a.embedding", "b.embedding")} AS dp,
          |    ${SimilarityQueries.sqlDot("a.embedding", "a.embedding")} AS na,
          |    ${SimilarityQueries.sqlDot("b.embedding", "b.embedding")} AS nb
          |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          |kr AS (SELECT a_id, b_id,
          |    row_number() OVER (PARTITION BY a_id
          |      ORDER BY dp / (sqrt(na) * sqrt(nb)) DESC, b_id ASC) AS rk
          |  FROM p),
          |eg AS (SELECT a_id AS src, b_id AS dst FROM kr
          |  WHERE rk <= ${SimilarityQueries.KnnK}),
          |dg AS (SELECT src, count(*) AS d FROM eg GROUP BY src),
          |nn AS (SELECT vec_id AS id FROM embeddings),
          |nx AS (SELECT count(*) AS n FROM nn),
          |bs AS (SELECT (15 * ${Scale}::BIGINT) // (100 * n) AS base,
          |              (${Scale}::BIGINT // n) AS r0 FROM nx),
          |r0 AS (SELECT nn.id, bs.r0 AS r FROM nn CROSS JOIN bs),
          |$iterCtes
          |SELECT id AS vec_id, r AS rank_fp
          |FROM r$Iterations
          |ORDER BY r DESC, id ASC LIMIT $TopK""".stripMargin)
  }
}
