package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does Catalyst's runtime Bloom-filter join pruning
  * (`InjectRuntimeFilter`, Spark 3.3+) engage on this engine's
  * fact⋈filtered-dim joins?
  *
  * At production scan sizes the rule fires on its own: defaults require
  * the CREATION side (the selective, filtered build side) to be under
  * `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`
  * (10 MB) and the APPLICATION side scan to exceed
  * `...applicationSideScanSizeThreshold` (10 GB) — exactly the 100 TB
  * fact-table regime, and never the 17 MB local fixtures. This probe
  * lowers the application threshold to 0 so the PLAN SHAPE is
  * observable locally: the fact scan gains a `bloom_filter_might_contain`
  * predicate fed by a one-pass `bloom_filter_agg` over the filtered
  * dim keys — rows that cannot join are dropped AT THE SCAN, before the
  * shuffle, which is the point at scale.
  *
  * `sbt "runMain graft.tools.RuntimeFilterProbe /root/testdata/sf0.1"`
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force the shuffle-join regime (the 100 TB fact⋈fact shape) and
      // let the bloom rule see a "large" application side locally
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // the creation-side gate compares ESTIMATED in-memory size (a
      // filtered scan keeps the full-scan estimate without CBO), so the
      // 17 MB fixture's orders scan can exceed the 10 MB default even
      // though the real filtered side is tiny — widen it for the probe
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val lineitem = Tables(spark, dir, "lineitem")
      val urgent = Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val joined = lineitem.join(urgent,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderdate")
        .agg(sum(col("l_extendedprice")).as("rev"))
      val plan = joined.queryExecution.optimizedPlan.toString
      val fired = plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg")
      println(s"[probe] runtime bloom filter injected: $fired")
      println(s"[probe] enabled conf: " + spark.conf
        .get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
      plan.linesIterator.filter(l =>
        l.contains("might_contain") || l.contains("bloom_filter_agg"))
        .foreach(l => println("[probe] " + l.trim.take(150)))
      val n = joined.count()
      println(s"[probe] result rows: $n")
    } finally spark.stop()
  }
}
