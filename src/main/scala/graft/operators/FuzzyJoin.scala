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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_name_pairs" -> fuzzyNamePairs)

  val oracles: Map[String, String] = Map(
    "fuzzy_name_pairs" ->
      s"""SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |  a.p_name AS a_name, b.p_name AS b_name,
        |  levenshtein(a.p_name, b.p_name)::BIGINT AS lev
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= $MaxEditDistance
        |  AND a.p_name <> b.p_name""".stripMargin)
}
