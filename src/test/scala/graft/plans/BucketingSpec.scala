package graft.plans

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located fact↔fact joins via bucketing — the pre-shuffle strategy for
  * repeated large joins at scale (SCALE.md): write both sides bucketed by
  * the join key, and the join plans with zero Exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed orders⋈lineitem joins without a shuffle") {
    val wh = Files.createTempDirectory("bucket_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables(spark, sf, "orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables(spark, sf, "lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the sf0.001 fact fits under the broadcast threshold — force the
    // co-located sort-merge path the bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try joined.queryExecution.executedPlan.toString
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    // the join itself must not exchange either side (the final aggregation
    // exchanges its tiny grouped output — that one is expected)
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"))
    assert(!joinSection.contains("Exchange"),
      s"bucketed join still shuffles:\n$joinSection")

    // and the result matches the unbucketed join
    val expected = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(joined).count() == 0)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
