package graft.text

import graft.Tables
import graft.text.TextQueries.words
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) budget allocation across sources — the
  * exact integer apportionment a sampling stage runs AFTER the mixture
  * weights are chosen: a fixed sample budget of [[Budget]] documents
  * split proportionally to per-source token mass, with the fractional
  * seats assigned to the largest remainders. Unlike naive
  * `round(B·share)` this is guaranteed to (a) sum EXACTLY to the
  * budget and (b) stay within ±1 of every source's exact quota — the
  * two laws the spec pins. Complements [[Sampling.mixWeights]] (which
  * scores shares) by turning shares into an exact integer head-count.
  *
  * All integer arithmetic: quota numerator `B·mass`, floor seat
  * `num div total`, remainder `num mod total`, leftover seats to the
  * top remainders with (remainder desc, source asc) total-order
  * tie-break. Cross-engine hash-exact by construction.
  *
  * Scale shape at 100 TB: one corpus scan with map-side partials to
  * the per-source mass (sources-bounded); everything after — the
  * window rank over sources, the seat assignment — runs on ≤ sources
  * rows. The `B·mass` product stays in-long below ~9.2e13 total
  * tokens per unit budget share (document-bounded; at larger scales
  * the same chain runs in decimal(38,0) unchanged). */
object Allocation {

  val Budget = 100000L

  def splitAllocation(s: SparkSession, dir: String): DataFrame = {
    val mass = Tables.parallel(s, dir, "documents")
      .select(col("source"), size(words(col("text"))).cast("long")
        .as("n_tokens"))
      .groupBy("source").agg(sum("n_tokens").as("mass"))
    val tot = mass.agg(sum("mass").as("total"))
    val q = mass.crossJoin(broadcast(tot))
      .select(col("source"), col("mass"), col("total"),
        expr(s"($Budget * mass) div total").as("base"),
        expr(s"($Budget * mass) % total").as("rem"))
    val wRem = Window.orderBy(desc("rem"), asc("source"))
    val wAll = Window.partitionBy(lit(1))
    q.withColumn("leftover", lit(Budget) - sum("base").over(wAll))
      .withColumn("rk", row_number().over(wRem))
      .select(col("source"), col("mass"), col("base"), col("rem"),
        when(col("rk") <= col("leftover"), 1L).otherwise(0L).as("extra"))
      .withColumn("alloc", col("base") + col("extra"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_allocation" -> splitAllocation)

  val oracles: Map[String, String] = Map(
    "split_allocation" ->
      s"""WITH mass AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '),
        |        x -> x <> '')))::BIGINT AS mass
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(mass)::BIGINT AS total FROM mass),
        |q AS (
        |  SELECT source, mass,
        |    (($Budget * mass) // total)::BIGINT AS base,
        |    (($Budget * mass) % total)::BIGINT AS rem
        |  FROM mass CROSS JOIN tot),
        |r AS (
        |  SELECT source, mass, base, rem,
        |    ($Budget - sum(base) OVER ())::BIGINT AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
        |  FROM q)
        |SELECT source, mass, base, rem,
        |  (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS extra,
        |  (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT
        |    AS alloc
        |FROM r""".stripMargin)
}
