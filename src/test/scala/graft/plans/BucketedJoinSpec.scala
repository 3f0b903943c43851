package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the write-time co-location contract the 100 TB design
  * leans on: a fact-fact join (orders ⋈ lineitem) pre-bucketed on the
  * join key on BOTH sides plans with NO shuffle exchange, while the
  * unbucketed twin must exchange both sides. This is the difference
  * between an O(corpus) network move per join and zero at scale; the
  * same contract co-locates repeated dedup/gram joins when the heavy
  * relations are bucketed by hash key. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("both-sides-bucketed fact join plans with zero exchanges") {
    // bucketed tables must go through the catalog (saveAsTable); managed
    // tables land in the session's default warehouse and DROP removes
    // their data
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Tables(spark, sf, "orders")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables(spark, sf, "lineitem")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      // disable auto-broadcast so the join shape is decided by
      // co-location, not by the tiny fixture size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // sanity: the unbucketed twin DOES need exchanges (the guard that
      // this test is actually asserting co-location, not a trivial plan)
      val unbucketed = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange"), "control plan unexpectedly shuffle-free")

      // and the bucketed result is the same data
      import spark.implicits._
      val a = joined.agg(sum("n")).as[Long].head()
      val b = unbucketed.agg(sum("n")).as[Long].head()
      assert(a == b)
    } finally {
      // restore the CAPTURED pre-test value, not a hardcoded default —
      // another suite customizing the conf must see its own value back
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("date-partitioned layout prunes partitions at the scan") {
    // the other write-time layout contract: a time-range query over a
    // date-partitioned table must touch only the matching partitions —
    // at 100 TB this is the difference between scanning a day and a year
    val dir = java.nio.file.Files.createTempDirectory("partlayout")
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      Tables(spark, sf, "events")
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date")
        .parquet(s"$dir/events_by_date")
      val days = java.nio.file.Files.list(dir.resolve("events_by_date"))
        .iterator()
      val nParts = {
        import scala.jdk.CollectionConverters._
        days.asScala.count(_.getFileName.toString.startsWith("event_date="))
      }
      assert(nParts > 3, s"fixture produced only $nParts date partitions")
      // AQE wraps the executed plan and hides the scan leaf — disable it
      // for this plan-shape check only (the codegen test's pattern)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = spark.read.parquet(s"$dir/events_by_date")
        .filter(col("event_date") === lit("2024-01-02"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val scan = q.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("PartitionFilters")).mkString
      assert(scan.contains("event_date"),
        s"no partition filter at the scan:\n$scan")
      // pruning is observable: after execution the scan's numFiles metric
      // must be far below the table's total file count (one day's files)
      q.collect()
      val totalFiles = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir.resolve("events_by_date"))
          .iterator().asScala.count(_.toString.endsWith(".parquet"))
      }
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
        }
      assert(scanned.nonEmpty && scanned.forall(_ < totalFiles),
        s"scan read ${scanned.mkString(",")} of $totalFiles files — no pruning")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
