package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked approximate string join (record linkage) — near-duplicate part
  * names by edit distance, with the classic two-phase shape every entity-
  * resolution pipeline uses at scale:
  *
  *  1. **Block**: equi-join on cheap exact keys (brand, size) so candidate
  *     generation is a hash shuffle, never a cross join. At 100 TB the
  *     block key IS the scalability contract — candidates per block are
  *     bounded (~16 here), so the quadratic phase runs on O(Σ block²)
  *     pairs instead of O(n²).
  *  2. **Match**: `levenshtein` on the candidate pairs only, threshold
  *     [[MaxEditDistance]], identical names excluded (those are exact-dedup
  *     territory, [[graft.dedup.DedupQueries.dedupExact]]).
  *
  * `a_id < b_id` emits each unordered pair once. Both engines implement
  * textbook unit-cost Levenshtein, so the gate holds pairs AND distances
  * to exact equality. (At sf0.001 the blocks are singletons and the
  * correct result is empty; candidates appear from sf0.01 up.) */
object FuzzyJoin {

  val MaxEditDistance = 3

  def fuzzyNamePairs(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("lev", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("lev") <= MaxEditDistance &&
        col("a.p_name") =!= col("b.p_name"))
      .select(col("a.p_partkey").as("a_id"), col("b.p_partkey").as("b_id"),
        col("a.p_name").as("a_name"), col("b.p_name").as("b_name"),
        col("lev").cast("long").as("lev"))
  }

  /** Winkler boost threshold for the Jaro-Winkler variant: high enough
    * that survivors are genuine near-names, low enough that sf0.01+
    * carries pairs (sf0.001's singleton blocks are correctly empty —
    * the [[fuzzyNamePairs]] precedent). */
  val MinJaroWinkler = 0.93

  /** The same blocked join scored by Jaro-Winkler similarity — the
    * prefix-weighted record-linkage lens beside raw edit distance,
    * via the native codegen kernel [[graft.functions.JaroWinklerSim]]
    * (bit-exact vs DuckDB's `jaro_winkler_similarity`, probed over
    * every blocked pair at all three SFs: 10 / 1,639 / 160,101 pairs,
    * zero raw-double mismatches — so the gate binds UNROUNDED values). */
  def fuzzyJaroPairs(s: SparkSession, dir: String): DataFrame = {
    def jw(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.JaroWinklerSim(
          org.apache.spark.sql.graft.ColumnBridge.expression(a),
          org.apache.spark.sql.graft.ColumnBridge.expression(b)))
    val p = Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("jw", jw(col("a.p_name"), col("b.p_name")))
      .filter(col("jw") >= MinJaroWinkler &&
        col("a.p_name") =!= col("b.p_name"))
      .select(col("a.p_partkey").as("a_id"), col("b.p_partkey").as("b_id"),
        col("a.p_name").as("a_name"), col("b.p_name").as("b_name"),
        col("jw"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_name_pairs" -> fuzzyNamePairs,
    "fuzzy_jaro_pairs" -> fuzzyJaroPairs)

  val oracles: Map[String, String] = Map(
    "fuzzy_name_pairs" ->
      s"""SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |  a.p_name AS a_name, b.p_name AS b_name,
        |  levenshtein(a.p_name, b.p_name)::BIGINT AS lev
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= $MaxEditDistance
        |  AND a.p_name <> b.p_name""".stripMargin,
    "fuzzy_jaro_pairs" ->
      s"""SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |  a.p_name AS a_name, b.p_name AS b_name,
        |  jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= $MinJaroWinkler
        |  AND a.p_name <> b.p_name""".stripMargin)
}
