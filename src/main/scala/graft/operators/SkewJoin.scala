package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew escape hatch (SCALE.md) for when AQE
  * skew splitting isn't available (e.g. a skewed build side that must
  * shuffle, or pre-3.x clusters): the skewed side gets a deterministic salt
  * in [0, k), the other side is replicated k times with every salt value,
  * and the join key becomes (key, salt) — hot keys spread across k tasks.
  *
  * Result is row-identical to the plain join (verified in SkewJoinSpec);
  * cost is k× replication of the smaller side, so pick k ≈ the skew factor.
  *
  * WHEN TO SALT — measured head-to-head vs AQE on planted-hot-key
  * corpora (`tools/SkewProbe`, table in SCALE_VALIDATION.md): for
  * shuffle JOINS on Spark 3.2+, AQE's native skew split is the better
  * default (its split count adapts to actual partition bytes; a fixed k
  * under-spreads and loses to salt→partition collisions). The salt
  * remains the answer for (a) AGGREGATION skew with non-collapsing
  * partials (collect_list & co — AQE only rewrites join reads, it never
  * splits an aggregation's partition; two-stage group by (key, salt)
  * then by key), (b) deterministic task-spread requirements, (c) pre-AQE
  * engines. count/sum/avg need no salt at any scale: their map-side
  * partials collapse to one row per key per task. */
object SkewJoin {

  /** Join `skewed` with `other` on `skewed(key) === other(otherKey)`,
    * spreading each key of the skewed side over `k` salts. The per-row salt
    * value only decides which task handles the row — any spread yields the
    * identical join result. The salt hashes the row CONTENT (all columns),
    * never `monotonically_increasing_id()`/`rand()`: a nondeterministic salt
    * re-spreads rows on task retry after a shuffle-fetch failure, while
    * already-fetched reducer output keeps the old spread — rows double or
    * vanish. A content hash reproduces the same spread on every recompute. */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 key: String, otherKey: String, k: Int,
                 joinType: String = "inner"): DataFrame = {
    require(k > 0)
    // only joins that never emit unmatched RIGHT rows preserve semantics —
    // an unmatched right row would surface once per salt replica
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(normalized),
      s"saltedJoin does not preserve '$joinType' semantics " +
        "(unmatched right rows would duplicate per salt)")
    val salted = skewed.withColumn("_salt",
      pmod(hash(skewed.columns.map(col): _*), lit(k)))
    val replicated = other.withColumn("_salt",
      explode(array((0 until k).map(lit): _*)))
    salted.join(replicated,
      salted(key) === replicated(otherKey) &&
        salted("_salt") === replicated("_salt"),
      joinType)
      .drop("_salt")
  }

  /** Gate query: the salted fact↔fact join must be row-identical to the
    * plain join, proven end-to-end by rolling the joined result up to a
    * 3-row status summary the oracle computes with an ordinary join. */
  def skewJoinRollup(s: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables(s, dir, "lineitem")
    val orders = Tables(s, dir, "orders")
    saltedJoin(lineitem, orders, "l_orderkey", "o_orderkey", k = 8)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_join_rollup" -> skewJoinRollup)

  val oracles: Map[String, String] = Map(
    "skew_join_rollup" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n_rows,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin)
}
