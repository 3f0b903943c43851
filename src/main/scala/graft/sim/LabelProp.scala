package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label propagation over the mutual kNN graph — the weak-label expansion
  * step (Zhu & Ghahramani 2002 label propagation; the discipline behind
  * FineWeb-Edu-style classifier bootstrapping): a small seeded subset
  * carries trusted labels, and unlabeled neighbors adopt the majority
  * label of their labeled neighbors, iterated a fixed number of rounds.
  * Labels FREEZE once assigned (the hard-clamp variant): propagation is
  * monotone, deterministic (majority count, ties to the smallest label),
  * and replayable as unrolled SQL rounds — no convergence dance.
  *
  * Seeds: `vec_id % 4 == 0` keeps its corpus label — a deterministic
  * 25 % "human-labeled" subset; the gate grades the spread against the
  * withheld true labels (`label_prop_confusion`), which is exactly how a
  * production pipeline validates propagated quality labels before
  * training on them.
  *
  * Scale shape at 100 TB: per round, one edges⋈labels join + one
  * (node, label)-keyed majority count — shuffle ∝ edges × const rounds,
  * and edges ≤ K·N by the kNN out-degree bound ([[GraphStats]]). The
  * frontier SHRINKS monotonically (frozen nodes leave it), so later
  * rounds are cheaper, not costlier — same family as the
  * `pagerank_knn` constant-iteration loop.
  */
object LabelProp {

  /** Fixed propagation rounds — covers diameter-3 neighborhoods of the
    * seed set; unreached nodes stay NULL (the honest output: a pipeline
    * routes those to human labeling, not a forced guess). */
  val Rounds = 3

  /** Seed predicate modulus: vec_id % [[SeedMod]] == 0 keeps its label. */
  val SeedMod = 4

  /** Materialize one round's labels AND sever estimated-statistics
    * lineage — same rationale as
    * [[graft.dedup.ConnectedComponents]]'s measured stats-snowball fix
    * (a loop joining its own prior output inflates originStats per
    * round; rebuilding from the checkpointed RDD yields fresh leaf
    * stats at constant driver cost). */
  private def materializeFresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** (node, seed, label_true, label_pred) after [[Rounds]] frozen-label
    * rounds; label_pred is NULL for nodes no round reached. */
  def propagated(s: SparkSession, dir: String): DataFrame =
    propagatedOver(s, dir, GraphStats.mutualEdges(s, dir))

  /** Same propagation over an explicit edge relation (dial probe path). */
  def propagatedOver(s: SparkSession, dir: String, e: DataFrame): DataFrame = {
    val all = graft.Tables(s, dir, "embeddings")
      .select(col("vec_id").as("node"), col("label").as("label_true"))
    // undirected edges walked both ways
    val d = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
      .repartition(col("b")) // every round joins on b — partition once
      .localCheckpoint(true) // reused every round (partitioning preserved)
    var labeled = all.filter(col("node") % SeedMod === 0)
      .select(col("node"), col("label_true").as("label"))
    for (_ <- 1 to Rounds) {
      val w = Window.partitionBy("node").orderBy(desc("n"), asc("label"))
      val newly = d.join(labeled.withColumnRenamed("node", "b"), "b")
        .select(col("a").as("node"), col("label"))
        .join(labeled.select("node"), Seq("node"), "left_anti")
        .groupBy("node", "label").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("node", "label")
      labeled = materializeFresh(labeled.union(newly))
    }
    all.join(labeled.withColumnRenamed("label", "label_pred"),
        Seq("node"), "left")
      .select(col("node"), (col("node") % SeedMod === 0).as("seed"),
        col("label_true"), col("label_pred"))
  }

  /** Gate query: the per-node propagation result. */
  def labelPropKnn(s: SparkSession, dir: String): DataFrame =
    propagated(s, dir)

  /** Withheld-label confusion rollup over NON-seed nodes — the
    * trust-but-verify table read before training on propagated labels
    * (unreached nodes appear under label_pred NULL). */
  def labelPropConfusion(s: SparkSession, dir: String): DataFrame =
    propagated(s, dir)
      .filter(!col("seed"))
      .groupBy("label_true", "label_pred")
      .agg(count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "label_prop_knn" -> labelPropKnn,
    "label_prop_confusion" -> labelPropConfusion)

  /** Unrolled-rounds oracle over the shared mutual-edge CTE. */
  private def roundsSql: String = {
    val base =
      s"""d AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
         |l0 AS (SELECT vec_id AS node, label FROM embeddings
         |       WHERE vec_id % $SeedMod = 0)""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      val prev = s"l${r - 1}"
      s"""c$r AS (SELECT d.a AS node, $prev.label, count(*) AS n
         |  FROM d JOIN $prev ON d.b = $prev.node
         |  WHERE d.a NOT IN (SELECT node FROM $prev)
         |  GROUP BY d.a, $prev.label),
         |n$r AS (SELECT node, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY node
         |      ORDER BY n DESC, label ASC) AS rk FROM c$r) WHERE rk = 1),
         |l$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM n$r)"""
        .stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  val oracles: Map[String, String] = Map(
    "label_prop_knn" ->
      s"""WITH ${GraphStats.edgesCteSql},
         |$roundsSql
         |SELECT i.vec_id AS node, (i.vec_id % $SeedMod = 0) AS seed,
         |  i.label AS label_true, l$Rounds.label AS label_pred
         |FROM embeddings i LEFT JOIN l$Rounds ON i.vec_id = l$Rounds.node"""
        .stripMargin,
    "label_prop_confusion" ->
      s"""WITH ${GraphStats.edgesCteSql},
         |$roundsSql
         |SELECT i.label AS label_true, l$Rounds.label AS label_pred,
         |  count(*) AS n
         |FROM embeddings i LEFT JOIN l$Rounds ON i.vec_id = l$Rounds.node
         |WHERE i.vec_id % $SeedMod <> 0
         |GROUP BY 1, 2""".stripMargin)
}
