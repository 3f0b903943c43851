package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental IVF index maintenance — the ANN-index face of
  * [[graft.dedup.SnapshotDedup]]: a vector index in production is built
  * once and then ABSORBS arriving batches without retraining (Jégou
  * 2011 §V: the coarse quantizer is frozen; only the inverted lists
  * grow). The operator assigns the arriving slice to the FROZEN shared
  * quantizer, reports per-cell base/new populations and growth, and
  * flags cells whose post-ingest occupancy crossed the re-split
  * threshold — the dial that tells an index operator when the frozen
  * quantizer stopped fitting the data distribution and [[Ivf.nListsFor]]
  * needs re-running.
  *
  * The arriving batch is the deterministic `vec_id % 10 == 7` slice
  * (fixture stand-in for a stream ingest; the assignment math is
  * literally the batch path with a different input relation).
  * `hot` is decided by integer cross-multiplication
  * (`occupancy · NLists > HotFactor · total`) — no average-occupancy
  * double enters the comparison.
  *
  * Scale shape at 100 TB: cell assignment is the shared memoized
  * quantizer's zero-shuffle literal-argmin projection (k in-codegen dot
  * products per row); the rollup is ONE cells-bounded aggregation with
  * map-side combine (partials ∝ partitions × NLists). Growth is
  * integer basis-points. Nothing in the op shuffles corpus rows. */
object IvfIncremental {

  /** Arriving-slice modulus and residue: vec_id % 10 == 7. */
  val BatchMod = 10
  val BatchRes = 7

  /** A cell is `hot` when occupancy · NLists > HotFactor · total. */
  val HotFactor = 2L

  def ivfIncremental(s: SparkSession, dir: String): DataFrame = {
    val (asg, centers) = Ivf.assignments(s, dir)
    synchronized { lastOracle = Some(oracleSql(centers)) }
    val isNew = pmod(col("vec_id"), lit(BatchMod)) === BatchRes
    val per = asg.groupBy("cell").agg(
      sum(when(isNew, 0L).otherwise(1L)).as("n_base"),
      sum(when(isNew, 1L).otherwise(0L)).as("n_new"))
    val tot = per.agg(sum(col("n_base") + col("n_new")).as("total"))
    per.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_base"), col("n_new"),
        when(col("n_base") > 0,
          expr("(10000 * n_new) div n_base")).cast("long").as("growth_bp"),
        ((col("n_base") + col("n_new")) * lit(Ivf.NLists.toLong) >
          lit(HotFactor) * col("total")).as("hot"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ivf_incremental" -> ivfIncremental)

  private var lastOracle: Option[String] = None

  /** Post-training oracle — the same centroid literals, argmin
    * assignment ([[Ivf]]'s nearest/lowest-index rule) and integer
    * rollup in SQL. */
  private def oracleSql(centers: Array[Array[Double]]): String = {
    val rows = centers.zipWithIndex.map { case (c, j) =>
      s"($j, ${Ivf.fmtD(c.map(x => x * x).sum)}, " +
        s"[${c.map(Ivf.fmtD).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""WITH cents(j, c2, c) AS (VALUES
       |    $rows),
       |sc AS (SELECT e.vec_id, c.j,
       |         c.c2 - 2 * (${SimilarityQueries.sqlDot("e.embedding", "c.c")})
       |           / sqrt(${SimilarityQueries.sqlDot("e.embedding", "e.embedding")})
       |           AS score
       |       FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, j AS cell
       |        FROM (SELECT *, row_number() OVER (
       |                PARTITION BY vec_id ORDER BY score ASC, j ASC) AS rn
       |              FROM sc)
       |        WHERE rn = 1),
       |per AS (SELECT cell,
       |          sum(CASE WHEN vec_id % $BatchMod = $BatchRes
       |              THEN 0 ELSE 1 END)::BIGINT AS n_base,
       |          sum(CASE WHEN vec_id % $BatchMod = $BatchRes
       |              THEN 1 ELSE 0 END)::BIGINT AS n_new
       |        FROM asg GROUP BY cell),
       |tot AS (SELECT sum(n_base + n_new)::BIGINT AS total FROM per)
       |SELECT cell, n_base, n_new,
       |  CASE WHEN n_base > 0 THEN (10000 * n_new) // n_base END::BIGINT
       |    AS growth_bp,
       |  (n_base + n_new) * ${Ivf.NLists} > $HotFactor * (SELECT total FROM tot)
       |    AS hot
       |FROM per""".stripMargin
  }

  def oracles: Map[String, String] =
    synchronized(lastOracle) match {
      case Some(sql) => Map("ivf_incremental" -> sql)
      case None => Map.empty
    }
}
