package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout key:
  * writing a 100 TB table sorted by `zkey(a, b)` clusters rows so parquet
  * min/max statistics prune scans on filters over EITHER key (the trick
  * behind Delta/Iceberg Z-order clustering; one sort at write time buys
  * two-dimensional data skipping forever after). Pure bit arithmetic —
  * 16 shift/mask/or terms per dimension — so the whole key is one codegen
  * projection and the DuckDB oracle computes the identical integers.
  */
object ZOrder {

  /** Bits interleaved per dimension (32-bit z-key total). */
  val ZBits = 16

  /** Interleave the low [[ZBits]] bits of `x` (even positions) and `y`
    * (odd positions). */
  def zkey(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Extract the dimension at bit offset `off` (0 = x, 1 = y) back out of
    * a z-key — the inverse used by the round-trip spec. */
  def unzkey(z: Column, off: Int): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(z, 2 * i + off).bitwiseAND(lit(1L)), i)
    }.reduce(_ + _)

  /** SQL twin of [[zkey]] over columns `x`/`y` (generated from the same
    * term list so the arithmetic can never drift). */
  private def zkeySql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Gate query: the layout preview a writer would produce — lineitem
    * keyed by zkey(l_partkey, l_suppkey), rolled up into 64Ki-wide coarse
    * z-ranges (the file boundaries of a sorted write), with the per-range
    * min/max of BOTH dimensions showing the clustering that makes
    * two-sided pruning work. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_partkey").bitwiseAND(lit(65535L)).as("x"),
        col("l_suppkey").bitwiseAND(lit(65535L)).as("y"))
      .withColumn("z", zkey(col("x"), col("y")))
    li.groupBy(shiftright(col("z"), 16).as("z_range"))
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_layout" -> zorderLayout)

  val oracles: Map[String, String] = Map(
    "zorder_layout" ->
      s"""WITH d AS (
        |  SELECT l_partkey & 65535 AS x, l_suppkey & 65535 AS y
        |  FROM lineitem),
        |z AS (SELECT x, y, ${zkeySql("x", "y")} AS z FROM d)
        |SELECT (z >> 16) AS z_range, count(*) AS n_rows,
        |  min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
        |  min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
        |FROM z GROUP BY z_range""".stripMargin)
}
