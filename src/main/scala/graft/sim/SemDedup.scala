package graft.sim

import graft.sim.SimilarityQueries.{cosine, sqlDot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", 2023) — the
  * embedding-space dedup that catches what MinHash cannot: documents
  * that SAY the same thing in different words. K-means partitions the
  * embedding space; only WITHIN a cluster are pairwise cosines computed
  * (the quadratic stays cell-local); within each duplicate group the
  * survivor is the member FARTHEST from its centroid (the paper's
  * keep-low-centroid-similarity rule — edge examples carry more signal
  * than prototypical ones).
  *
  * The quantizer is [[Ivf.assignments]] — the same trained centroids,
  * memo, and portable literal-argmin cell assignment, so training is
  * paid once across the IVF and SemDeDup gate queries and the oracle
  * reproduces assignment bit-for-bit from inlined centroid literals.
  * The keeper rank needs no extra arithmetic: within a fixed cell the
  * winning assignment score ‖c‖² − 2·(x·c)/‖x‖ is strictly decreasing
  * in centroid cosine, so "farthest from centroid" = HIGHEST score,
  * ties to the smaller vec_id. A vector is dropped iff some same-cell
  * neighbor above the duplicate threshold dominates it under that
  * order — the deterministic per-pair form of the paper's
  * one-survivor-per-group rule (on a duplicate chain every member
  * dominated by its neighbor falls, local maxima survive).
  *
  * Scale shape: the self-join shuffles on `cell` only; with NLists ∝
  * corpus size (the paper runs k = 50k on LAION) cells stay
  * constant-sized and the within-cell quadratic is O(N·cellsize), not
  * O(N²). The dominated set re-joins UNhinted: it is duplicate-count
  * sized, which a heavily-duplicated crawl can push toward corpus
  * size, so AQE picks broadcast only when the measured size allows.
  * Reference test surface: the reference has no
  * embedding-space dedup — this extends `internal/` dedup semantics
  * (SURVEY.md §2.6 J4 dedup family) to the embedding column, next to
  * `dedup_embedding_cosine`'s LSH pair finder.
  */
object SemDedup {

  /** Duplicate threshold: cos > ε pairs are semantic duplicates. The
    * paper sweeps ε ∈ [0.95, 0.999] on real embeddings; the synthetic
    * corpus's planted structure tops out near 0.51, so the gate runs at
    * 0.4 to keep both branches of the keep flag populated. */
  val Epsilon = 0.4

  /** Per-vector dedup verdict: (vec_id, cell, cent_score, keep) —
    * cent_score is the (rounded) assignment score the keeper rank uses;
    * `keep = false` marks vectors dominated by a same-cell duplicate. */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val (assigned, centers) = Ivf.assignments(s, dir)
    synchronized { lastOracle = Some(oracleSql(centers)) }
    verdicts(assigned, centers, Epsilon)
  }

  /** Dedup verdicts at an explicit threshold — the ε dial
    * (`SemDedupDialSpec` proves kept-count monotone in ε; the gate query
    * binds [[Epsilon]]). */
  private[graft] def verdicts(assigned: DataFrame,
                              centers: Array[Array[Double]],
                              eps: Double): DataFrame = {
    // m is re-evaluated on each of the three plan branches (x side, y
    // side, output) over the cached assignment — a deliberate trade:
    // NLists dot products per vector ×3 is constant per-row work,
    // negligible next to the within-cell pairwise cosines, and caching
    // the projection would double-buffer the corpus for it.
    val a = assigned.select(col("vec_id"), col("embedding"), col("cell"),
      least(Ivf.centroidScores(centers).toSeq: _*).as("m"))
    val dominated = a.as("x").join(a.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") =!= col("y.vec_id") &&
          cosine(col("x.embedding"), col("y.embedding")) > lit(eps) &&
          (col("y.m") > col("x.m") ||
            (col("y.m") === col("x.m") &&
              col("y.vec_id") < col("x.vec_id"))),
        "left_semi")
      .select(col("vec_id"), lit(false).as("keep"))
    // NOT broadcast-hinted: the dominated set is duplicate-count sized,
    // which on a heavily-duplicated crawl can approach the corpus — let
    // AQE convert to broadcast at runtime when it measures small, and
    // fall back to a shuffle join on vec_id when it doesn't.
    a.join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        round(col("m"), 4).as("cent_score"),
        coalesce(col("keep"), lit(true)).as("keep"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "semdedup" -> semDedup)

  // Dynamic post-training oracle, same contract as Ivf.lastIvfOracle:
  // Verify runs every query before dumping oracle SQL.
  private var lastOracle: Option[String] = None

  /** Centroid literals inlined; assignment is the identical
    * (score, j) argmin as [[Ivf]]'s oracle, keeping the winning score
    * as the keeper rank; the dominated set is the same EXISTS the
    * Spark semi-join computes. */
  private def oracleSql(centers: Array[Array[Double]]): String = {
    val rows = centers.zipWithIndex.map { case (c, j) =>
      s"($j, ${Ivf.fmtD(c.map(x => x * x).sum)}, " +
        s"[${c.map(Ivf.fmtD).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""WITH cents(j, c2, c) AS (VALUES
       |    $rows),
       |sc AS (SELECT e.vec_id, e.embedding, c.j,
       |         c.c2 - 2 * (${sqlDot("e.embedding", "c.c")})
       |           / sqrt(${sqlDot("e.embedding", "e.embedding")}) AS score
       |       FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, embedding, j AS cell, score AS m
       |        FROM (SELECT *, row_number() OVER (
       |                PARTITION BY vec_id ORDER BY score ASC, j ASC) AS rn
       |              FROM sc)
       |        WHERE rn = 1),
       |dom AS (SELECT DISTINCT x.vec_id
       |        FROM asg x JOIN asg y
       |          ON x.cell = y.cell AND x.vec_id <> y.vec_id
       |         AND (${sqlDot("x.embedding", "y.embedding")})
       |             / (sqrt(${sqlDot("x.embedding", "x.embedding")})
       |              * sqrt(${sqlDot("y.embedding", "y.embedding")}))
       |             > $Epsilon
       |         AND (y.m > x.m OR (y.m = x.m AND y.vec_id < x.vec_id)))
       |SELECT a.vec_id, a.cell, round(a.m, 4) AS cent_score,
       |       (d.vec_id IS NULL) AS keep
       |FROM asg a LEFT JOIN dom d ON a.vec_id = d.vec_id""".stripMargin
  }

  def oracles: Map[String, String] =
    synchronized(lastOracle) match {
      case Some(sql) => Map("semdedup" -> sql)
      case None => Map.empty
    }
}
