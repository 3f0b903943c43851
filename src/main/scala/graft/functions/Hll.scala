package graft.functions

import graft.Tables
import graft.text.TextQueries.trigramsSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HyperLogLog++ distinct counting via Spark's native
  * `approx_count_distinct` (Heule, Nunkesser, Hall 2013) — the
  * fixed-memory cardinality tier next to [[Kmv]].
  *
  * [[Kmv]] stays inside the hash-equality gate because its estimator is a
  * pure function of a deterministic hash an external engine can replay;
  * HLL++'s register layout is Spark-internal, so its gate is the same
  * bound-assertion pattern as `q15_approx_percentiles`: the oracle
  * computes the EXACT per-group cardinality (hash-checked) and `TRUE`
  * flags, and the Spark side emits the same exact count plus a boolean
  * that the sketch landed within 3·rsd of it — a red row the moment the
  * estimate leaves its guarantee. `approx_count_distinct` is
  * deterministic for a given input (seed-free xxhash), so the gate is
  * stable, not flaky.
  *
  * Why it earns a slot anyway: at 100 TB HLL++ is the sketch you reach
  * for first — fixed ~1.4 KB of registers per group at 5 % rsd
  * regardless of cardinality (KMV's k·8 bytes is comparable but its
  * error is ~13 % at k=64; HLL's rsd dial is cheaper per bit), partial
  * aggregation merges registers map-side, and no shuffle of distinct
  * values ever happens — unlike the exact `count(DISTINCT)` twin in the
  * same query, whose expand-shuffle is the thing you're avoiding. The
  * trigram domain (~10⁵ per source at sf0.1, vs a 31-word vocabulary)
  * gives the estimator a cardinality where sketching is actually
  * meaningful.
  */
object Hll {

  /** Relative standard deviation passed to `approx_count_distinct`. */
  val Rsd = 0.05

  /** Gate tolerance: 3·rsd — ~99.7 % per-group a priori; deterministic
    * post hoc (verified green at sf0.001/0.01/0.1). Regen sensitivity,
    * by design: a driver testdata regeneration redraws every group's
    * estimate, so with ~60 (source, sf) groups there is a ~16 % chance
    * per regen that SOME group lands outside 3σ and reddens `ok_hll`
    * with no code defect — re-run the gate before debugging; the bound
    * is kept at 3σ because the flag exists to catch estimator drift,
    * and widening it to 4σ would trade that sensitivity for regen
    * robustness. */
  val Tol = 3 * Rsd

  /** Per-source distinct-trigram cardinality: exact (hash-gated) next to
    * the HLL++ estimate folded into a within-3σ flag. One scan; the two
    * aggregates share the exploded shingle relation. */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    graft.text.TextQueries.sourceTrigrams(Tables.parallel(s, dir, "documents"))
      .groupBy("source")
      .agg(
        countDistinct(col("sg")).as("n_exact"),
        approx_count_distinct(col("sg"), Rsd).as("n_hll"))
      .select(
        col("source"), col("n_exact"),
        (abs(col("n_hll") - col("n_exact"))
          <= lit(Tol) * col("n_exact")).as("ok_hll"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hll_distinct" -> hllDistinct)

  val oracles: Map[String, String] = Map(
    // Bound assertion (see q15_approx_percentiles): the oracle carries the
    // exact cardinality; TRUE matches iff the sketch met 3·rsd everywhere.
    "hll_distinct" ->
      s"""WITH d AS (SELECT source, list_filter(string_split(text, ' '),
        |              x -> x <> '') AS w
        |            FROM documents),
        |g AS (SELECT source, unnest($trigramsSql) AS sg
        |      FROM d WHERE len(w) >= 3)
        |SELECT source, count(DISTINCT sg) AS n_exact, TRUE AS ok_hll
        |FROM g GROUP BY source""".stripMargin)
}
