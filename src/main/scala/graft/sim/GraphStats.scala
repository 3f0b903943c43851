package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural statistics of the corpus kNN graph — the curation signals a
  * pipeline reads off the neighbor structure before acting on it:
  * mutual-degree tells how connected each vector is (hubs ≈ template/
  * boilerplate regions, isolates ≈ novel content), triangle counts and the
  * local clustering coefficient (Watts & Strogatz 1998) tell how CLIQUEY a
  * neighborhood is — dense triangles around a node mean a tight
  * near-duplicate community (SemDeDup-style redundancy), high degree with
  * few triangles means a hub bridging unrelated content.
  *
  * Graph: the MUTUAL kNN graph — an undirected edge (u,v) exists iff u
  * ranks v in its top-K AND v ranks u (the standard symmetrization that
  * kills asymmetric hub edges). Built from [[SimilarityQueries.knnGraphLsh]]
  * so the neighbor definition cannot drift from the `knn_graph_lsh` gate.
  *
  * Scale shape at 100 TB: out-degree is ≤ K by construction, so mutual
  * degree is ≤ K too; the edge list is ≤ K·N rows and the triangle join's
  * wedge relation is Σ deg² ≤ K²·N — every stage is LINEAR in corpus size
  * at fixed K (contrast with triangle counting on an unbounded-degree
  * graph, which needs degree-ordered orientation to tame hubs; kNN gives
  * that bound for free). Joins shuffle on node ids — no broadcast needed,
  * no skew beyond bucket occupancy, which the LSH plane dial already pins.
  */
object GraphStats {

  // one-slot memo for the mutual-edge relation: four gate queries (both
  // graph stats + both label-prop) and any production consumer read the
  // SAME graph, and the kNN build is the dominant shared cost — same
  // bounded-eviction policy as Ivf.assignments / Multimodal's media memo
  private var lastEdges:
    Option[((SparkSession, String, Long), DataFrame)] = None

  /** Undirected mutual-kNN edges (u < v), one row per edge — memoized
    * per most-recent (session, dir, source stamp), eagerly materialized
    * (the consumers all read it at least twice). */
  def mutualEdges(s: SparkSession, dir: String): DataFrame = synchronized {
    val key = (s, dir, graft.Tables.sourceStamp(dir, "embeddings"))
    lastEdges match {
      case Some((k, v)) if k == key => v
      case _ =>
        val e = mutualEdgesFrom(SimilarityQueries.knnGraphLshShared(s, dir))
          .localCheckpoint(true)
        lastEdges = Some((key, e))
        e
    }
  }

  /** Mutualization of any directed kNN relation (a_id, b_id, ...):
    * undirected edges (u < v) kept iff BOTH directions rank each other.
    * Shared by the memoized gate graph and the dial-measurement path. */
  def mutualEdgesFrom(knn: DataFrame): DataFrame = {
    val k = knn.select("a_id", "b_id")
    k.as("f").join(k.as("r"),
        col("f.a_id") === col("r.b_id") && col("f.b_id") === col("r.a_id"))
      .filter(col("f.a_id") < col("f.b_id"))
      .select(col("f.a_id").as("u"), col("f.b_id").as("v"))
  }

  /** Dialed-graph edges: the kNN build binds `planesFor(N)` so bucket
    * occupancy stays pinned as the corpus grows — the production
    * binding the scale probe measures end-to-end (the GATE keeps the
    * fixture constant for oracle determinism). Not memoized: the probe
    * owns materialization. */
  def mutualEdgesDialed(s: SparkSession, dir: String): DataFrame = {
    val n = graft.Tables(s, dir, "embeddings").count()
    mutualEdgesFrom(
      SimilarityQueries.knnGraphLsh(s, dir, SimilarityQueries.planesFor(n)))
  }

  /** Drop the memoized edge relation (tests; corpus switches evict). */
  def release(): Unit = synchronized { lastEdges = None }

  /** Per-node mutual degree, triangle count, and local clustering
    * coefficient 2T/(d(d−1)) (exact-integer inputs, one rounded division). */
  def triangleStats(s: SparkSession, dir: String): DataFrame =
    triangleStatsOver(mutualEdges(s, dir)) // memoized + materialized; read 4×

  /** Same stats over an explicit edge relation (dial probe path). */
  def triangleStatsOver(e: DataFrame): DataFrame = {
    // wedges u<v<w sharing v, closed by the (u,w) edge
    val tri = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      .join(e.as("e3"), col("x") === col("e3.u") && col("z") === col("e3.v"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)), 4))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Mutual-degree histogram — the one-glance connectivity profile
    * (isolated vectors appear under degree 0 via the left side). */
  def degreeHist(s: SparkSession, dir: String): DataFrame = {
    val ids = graft.Tables(s, dir, "embeddings").select(col("vec_id").as("node"))
    val deg = mutualEdges(s, dir)
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    ids.join(deg, Seq("node"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** Component-size histogram of the mutual kNN graph — the "semantic
    * islands" census beside the degree histogram: a census dominated by
    * mid-size components means the corpus organizes into tight topical
    * pockets (SemDeDup's hunting ground), a long size-1 tail means
    * novel content the coverage sampler ([[Coreset]]) must protect.
    * Isolated vectors (no mutual edge) count as singleton components
    * via the nodes-side left join. CC is the engine-standard
    * pointer-doubling core ([[graft.dedup.ConnectedComponents
    * .connectedComponents]]); the probe-measured component sizes are
    * small (≤ ~30 at gate SFs), so the oracle's recursive closure is
    * Σsize²-bounded. */
  def knnComponents(s: SparkSession, dir: String): DataFrame = {
    val labels = graft.dedup.ConnectedComponents.connectedComponents(
      mutualEdges(s, dir).select(col("u").as("src"), col("v").as("dst")))
    val nodes = graft.Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .groupBy("comp").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_components"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_triangle_stats" -> triangleStats,
    "knn_degree_hist" -> degreeHist,
    "knn_components" -> knnComponents)

  /** Shared oracle CTE: the knn_graph_lsh ranking (verbatim semantics)
    * symmetrized to mutual undirected edges — shared with [[LabelProp]]
    * so the two gates bind the same graph definition. */
  private[sim] def edgesCteSql: String = edgesCte

  private val edgesCte =
    s"""b AS (SELECT vec_id, embedding,
       |    ${SimilarityQueries.sqlBucket("embedding")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${SimilarityQueries.sqlDot("a.embedding", "b.embedding")} AS dp,
       |    ${SimilarityQueries.sqlDot("a.embedding", "a.embedding")} AS na,
       |    ${SimilarityQueries.sqlDot("b.embedding", "b.embedding")} AS nb
       |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |k AS (SELECT a_id, b_id FROM (
       |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
       |      ORDER BY dp / (sqrt(na) * sqrt(nb)) DESC, b_id ASC) AS rk
       |    FROM p) WHERE rk <= ${SimilarityQueries.KnnK}),
       |e AS (SELECT f.a_id AS u, f.b_id AS v
       |  FROM k f JOIN k r ON f.a_id = r.b_id AND f.b_id = r.a_id
       |  WHERE f.a_id < f.b_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "knn_triangle_stats" ->
      s"""WITH $edgesCte,
         |tri AS (SELECT unnest([x, y, z]) AS node FROM (
         |    SELECT e1.u AS x, e1.v AS y, e2.v AS z
         |    FROM e e1 JOIN e e2 ON e1.v = e2.u
         |    JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v)),
         |tc AS (SELECT node, count(*) AS n_triangles FROM tri GROUP BY node),
         |deg AS (SELECT node, count(*) AS degree FROM (
         |    SELECT unnest([u, v]) AS node FROM e) GROUP BY node)
         |SELECT deg.node, deg.degree,
         |  coalesce(tc.n_triangles, 0)::BIGINT AS n_triangles,
         |  CASE WHEN deg.degree >= 2 THEN
         |    round(2.0 * coalesce(tc.n_triangles, 0)
         |          / (deg.degree * (deg.degree - 1)), 4)
         |  ELSE 0.0 END AS clustering
         |FROM deg LEFT JOIN tc USING (node)""".stripMargin,
    "knn_degree_hist" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT node, count(*) AS degree FROM (
         |    SELECT unnest([u, v]) AS node FROM e) GROUP BY node)
         |SELECT coalesce(deg.degree, 0)::BIGINT AS degree,
         |  count(*) AS n_nodes
         |FROM embeddings i LEFT JOIN deg ON i.vec_id = deg.node
         |GROUP BY 1""".stripMargin,
    "knn_components" ->
      s"""WITH RECURSIVE $edgesCte,
         |edges AS (SELECT u AS src, v AS dst FROM e
         |          UNION SELECT v, u FROM e),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, g.dst FROM reach r JOIN edges g ON g.src = r.b),
         |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |lab AS (SELECT i.vec_id AS id, coalesce(c.comp, i.vec_id) AS comp
         |        FROM embeddings i LEFT JOIN comp c ON c.id = i.vec_id),
         |sz AS (SELECT comp, count(*)::BIGINT AS size FROM lab GROUP BY comp)
         |SELECT size, count(*)::BIGINT AS n_components
         |FROM sz GROUP BY size""".stripMargin)
}
