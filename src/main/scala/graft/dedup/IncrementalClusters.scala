package graft.dedup

import graft.dedup.ConnectedComponents.connectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental cluster-LABEL maintenance — the delta-merge step that
  * closes the incremental-dedup loop: [[SnapshotDedup]] finds the new
  * batch's verified pairs and `ivf_incremental` maintains the ANN
  * index, but through round 8 cluster labels were still recomputed
  * globally per ingest. Here the standing corpus keeps its frozen
  * label relation (id → component min), and a new batch updates labels
  * by running connected components over ONLY:
  *
  *   - the new verified pairs (batch↔corpus and batch↔batch), and
  *   - one STAR EDGE (member → frozen label) per member of a TOUCHED
  *     frozen component — a component is touched iff one of its
  *     members appears in a new pair.
  *
  * Star edges collapse each touched component to a 1-hop star, so the
  * delta graph has batch-pairs + touched-members edges — work
  * ∝ batch + touched components, NEVER corpus. Untouched components
  * (the overwhelming mass at real dup densities) are never read past
  * the one semi-join that classifies them.
  *
  * CORRECTNESS (why delta ≡ global restricted to affected nodes): new
  * documents never appear in old-old pairs, so any global path between
  * affected nodes alternates new-pair hops and within-frozen-component
  * old-pair segments; every frozen component on such a path contains a
  * new-pair endpoint, hence is touched, hence is fully present in the
  * delta graph as its star (which preserves exactly its connectivity);
  * and every member id is a node of the delta graph, so the component
  * minimum — the label — is preserved too. The affected set is closed
  * under global connectivity, so labels agree exactly. The oracle
  * checks this the hard way: the full pair set's recursive closure
  * restricted to the affected nodes.
  *
  * The batch split is the same deterministic arithmetic as
  * [[SnapshotDedup]] (`doc_id % BatchMod == 0` ⇒ new), so the frozen
  * relation is the old-old-pair components and both engines derive
  * byte-identical splits.
  */
object IncrementalClusters {

  /** Core delta-merge over explicit pair relations (spec entry point):
    * `oldPairs`/`newPairs` are (a_id, b_id); returns one row per
    * AFFECTED node: (doc_id, cluster_id, prev_cluster_id), with
    * prev_cluster_id = −1 for nodes that had no frozen label (new docs
    * and previously-singleton old docs). */
  def deltaLabels(oldPairs: DataFrame, newPairs: DataFrame): DataFrame = {
    val newTouch = newPairs.select("a_id", "b_id").localCheckpoint(true)
    // frozen = "yesterday's" label relation (in production this is a
    // stored table; the gate derives it from the old-old pairs so the
    // oracle can replay it)
    val frozen = connectedComponents(oldPairs
      .select(col("a_id").as("src"), col("b_id").as("dst")))
      .localCheckpoint(true) // feeds 3 consumers: touched, members, prev
    val endpoints = newTouch.select(col("a_id").as("id"))
      .unionByName(newTouch.select(col("b_id").as("id"))).distinct()
    val touched = frozen.join(endpoints, Seq("id"), "left_semi")
      .select("comp").distinct()
    val members = frozen.join(touched, Seq("comp"), "left_semi")
    val starEdges = members.select(col("id").as("src"), col("comp").as("dst"))
    val edges = starEdges.unionByName(
      newTouch.select(col("a_id").as("src"), col("b_id").as("dst")))
    connectedComponents(edges)
      .join(frozen.withColumnRenamed("comp", "prev"), Seq("id"), "left")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        coalesce(col("prev"), lit(-1L)).as("prev_cluster_id"))
  }

  /** Gate: the LSH-verified pair relation split by the snapshot
    * arithmetic — old-old pairs freeze the labels, pairs touching the
    * new batch drive the delta. */
  def dedupClustersDelta(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.dedupMinhashLsh(s, dir)
      .select("a_id", "b_id").localCheckpoint(true) // one pair-gen pass
    val newA = col("a_id") % SnapshotDedup.BatchMod === 0
    val newB = col("b_id") % SnapshotDedup.BatchMod === 0
    deltaLabels(pairs.filter(!newA && !newB), pairs.filter(newA || newB))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters_delta" -> dedupClustersDelta)

  val oracles: Map[String, String] = Map(
    "dedup_clusters_delta" ->
      (s"WITH RECURSIVE ${DedupQueries.lshPairsCte},\n" +
        s"""oldedges AS (SELECT a_id AS src, b_id AS dst FROM lshpairs
          |             WHERE a_id % ${SnapshotDedup.BatchMod} <> 0
          |               AND b_id % ${SnapshotDedup.BatchMod} <> 0
          |             UNION SELECT b_id, a_id FROM lshpairs
          |             WHERE a_id % ${SnapshotDedup.BatchMod} <> 0
          |               AND b_id % ${SnapshotDedup.BatchMod} <> 0),
          |oreach(a, b) AS (
          |  SELECT src, src FROM oldedges
          |  UNION
          |  SELECT r.a, e.dst FROM oreach r JOIN oldedges e ON e.src = r.b),
          |ocomp AS (SELECT a AS doc_id, min(b) AS comp
          |          FROM oreach GROUP BY a),
          |newpairs AS (SELECT a_id, b_id FROM lshpairs
          |             WHERE a_id % ${SnapshotDedup.BatchMod} = 0
          |                OR b_id % ${SnapshotDedup.BatchMod} = 0),
          |touched AS (SELECT DISTINCT comp FROM ocomp
          |            WHERE doc_id IN (SELECT a_id FROM newpairs
          |                             UNION SELECT b_id FROM newpairs)),
          |affected AS (SELECT DISTINCT doc_id FROM (
          |             SELECT doc_id FROM ocomp
          |             WHERE comp IN (SELECT comp FROM touched)
          |             UNION ALL SELECT a_id FROM newpairs
          |             UNION ALL SELECT b_id FROM newpairs)),
          |edges AS (SELECT a_id AS src, b_id AS dst FROM lshpairs
          |          UNION SELECT b_id, a_id FROM lshpairs),
          |reach(a, b) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
          |comp AS (SELECT a AS doc_id, min(b) AS cluster_id
          |         FROM reach GROUP BY a)
          |SELECT c.doc_id, c.cluster_id,
          |  coalesce(m.comp, -1) AS prev_cluster_id
          |FROM comp c
          |JOIN affected f ON f.doc_id = c.doc_id
          |LEFT JOIN ocomp m ON m.doc_id = c.doc_id""".stripMargin))
}
