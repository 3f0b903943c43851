package graft.sim

import graft.sim.SimilarityQueries.{KnnK, dot, sqlDot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN graph over the IVF coarse quantizer's cells — the recall-tier
  * graph construction beside the LSH-bucket graphs: sign-LSH bucketing
  * recalls ~100 % of true NEAR-DUPLICATE edges but only 2–15 % of exact
  * top-k edges at fixture geometry (measured, `RecallProbe`); k-means
  * cells group by actual cosine geometry rather than random
  * hyperplanes, so cell-local neighborhoods recover far more of the
  * true kNN structure at the same Σ n_cell² pair budget — and the cell
  * count is the SAME dial (`Ivf.nListsFor(n)`) the IVF query tier
  * already binds, trained once and shared through [[Ivf.assignments]]'
  * memo with `ivf_topk`/`semdedup` (one quantizer, three consumers).
  *
  * Same output contract as `knn_graph_lsh` (a_id, rk, b_id, cosine);
  * the oracle is dynamic post-training in the `ivf_topk` pattern: the
  * trained centroid literals replay the argmin assignment in DuckDB,
  * then the within-cell pair ranking — so the gate hash-checks the
  * whole pipeline including the quantizer.
  *
  * Scale shape: one cell equi-self-join (pair work Σ n_cell², pinned by
  * the nListsFor dial), per-vector top-K via WindowGroupLimit inside
  * doc-bounded windows; training cost is paid once into the shared
  * memo (shuffle measured corpus-independent in `ivf_topk`'s row). */
object KnnGraphIvf {

  private var lastOracle: Option[String] = None

  def knnGraphIvf(s: SparkSession, dir: String): DataFrame = {
    val (assigned, centers) = Ivf.assignments(s, dir)
    synchronized { lastOracle = Some(oracleSql(centers)) }
    graphOf(assigned.select(col("vec_id"), col("embedding"), col("cell")))
  }

  /** Dialed form over the production assignment path
    * ([[Ivf.assignmentsMl]] — model data out of the plan, no codegen
    * cliff at hundreds of cells): production binds
    * `nLists = Ivf.nListsFor(corpusSize)` so cell occupancy — and the
    * in-join Σ n_cell² — stays pinned as the corpus grows. The gate
    * binds the fixture constant through [[knnGraphIvf]]. */
  def knnGraphIvfDialed(s: SparkSession, dir: String, nLists: Int)
      : DataFrame =
    graphOf(graft.Tables.parallel(s, dir, "embeddings")
      .join(Ivf.assignmentsMl(s, dir, nLists), "vec_id")
      .select(col("vec_id"), col("embedding"), col("cell")))

  private def graphOf(assigned: DataFrame): DataFrame = {
    val v = assigned.select(col("vec_id"), col("embedding"), col("cell"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val w = Window.partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KnnK)
      .select(col("a_id"), col("rk").cast("long").as("rk"),
        col("b_id"), round(col("cos"), 4).as("cosine"))
  }

  /** Post-training oracle: trained centroids as literals → the same
    * (‖c‖² − 2·(x·c)/‖x‖, j) argmin assignment `Ivf` computes → the
    * within-cell ranked pairs, all in DuckDB. */
  private def oracleSql(centers: Array[Array[Double]]): String = {
    val rows = centers.zipWithIndex.map { case (c, j) =>
      s"($j, ${Ivf.fmtD(c.map(x => x * x).sum)}, " +
        s"[${c.map(Ivf.fmtD).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""WITH cents(j, c2, c) AS (VALUES
       |    $rows),
       |sc AS (SELECT e.vec_id, e.embedding, c.j,
       |         c.c2 - 2 * (${sqlDot("e.embedding", "c.c")})
       |           / sqrt(${sqlDot("e.embedding", "e.embedding")})
       |           AS score
       |       FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, embedding, j AS cell
       |        FROM (SELECT *, row_number() OVER (
       |                PARTITION BY vec_id ORDER BY score ASC, j ASC) AS rn
       |              FROM sc)
       |        WHERE rn = 1),
       |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${sqlDot("a.embedding", "b.embedding")} AS dp,
       |    ${sqlDot("a.embedding", "a.embedding")} AS na,
       |    ${sqlDot("b.embedding", "b.embedding")} AS nb
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |r AS (SELECT a_id, b_id, dp / (sqrt(na) * sqrt(nb)) AS cos,
       |    row_number() OVER (PARTITION BY a_id
       |      ORDER BY dp / (sqrt(na) * sqrt(nb)) DESC, b_id ASC) AS rk
       |  FROM p)
       |SELECT a_id, rk::BIGINT AS rk, b_id, round(cos, 4) AS cosine
       |FROM r WHERE rk <= $KnnK""".stripMargin
  }

  /** Semantic clusters — the cluster-and-curate consumer of the
    * embedding near-dup tier: run distributed connected components
    * ([[graft.dedup.ConnectedComponents.connectedComponents]] — the
    * proven min-label machinery the text dedup tier uses) over the
    * VERIFIED embedding near-dup pairs (`dedup_embedding_cosine`: LSH
    * bucket candidates, exact cosine ≥ 0.4 verify), and report each
    * cluster (id = min member) with its member count and span. A
    * curation pass samples per cluster instead of per vector,
    * de-weighting dense semantic regions. Built on the verified-pair
    * relation, not thresholded kNN edges: the pair set is the complete
    * in-bucket ≥0.4 band (and on this corpus no pair reaches the
    * higher bands — max pairwise cosine ≈ 0.48 — so a 0.95-style cut
    * would gate on an empty relation). Oracle: recursive-CTE
    * transitive closure over the same pair SQL, the `dedup_clusters`
    * pattern. */
  def semanticClusters(s: SparkSession, dir: String): DataFrame = {
    val edges = SimilarityQueries.dedupEmbeddingCosine(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    graft.dedup.ConnectedComponents.connectedComponents(edges)
      .groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), max("id").as("max_member"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_graph_ivf" -> knnGraphIvf,
    "semantic_clusters" -> semanticClusters)

  private val clustersOracleSql: String = {
    // the pair SQL keeps its own WITH chain — legal as a nested subquery
    val pairSql = SimilarityQueries.oracles("dedup_embedding_cosine")
    s"""WITH RECURSIVE pairs AS ($pairSql),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |          UNION SELECT b_id, a_id FROM pairs),
       |reach(a, b) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r2.a, e.dst FROM reach r2 JOIN edges e ON e.src = r2.b),
       |comp AS (SELECT a AS id, min(b) AS cluster_id
       |         FROM reach GROUP BY a)
       |SELECT cluster_id, count(*) AS n_members, max(id) AS max_member
       |FROM comp GROUP BY cluster_id""".stripMargin
  }

  /** knn_graph_ivf's oracle is dynamic in the `ivf_topk` pattern
    * (present once the quantizer has trained — Verify runs queries
    * before dumping oracle SQL); the clusters oracle is static. */
  def oracles: Map[String, String] = {
    val base = Map("semantic_clusters" -> clustersOracleSql)
    synchronized(lastOracle) match {
      case Some(sql) => base + ("knn_graph_ivf" -> sql)
      case None => base
    }
  }
}
