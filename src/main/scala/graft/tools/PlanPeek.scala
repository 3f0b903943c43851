package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print a gate query's EXECUTED physical plan (post-AQE) for ad-hoc
  * audit: `sbt "runMain graft.tools.PlanPeek <query> [sfDir]"`.
  * Complements the lockfile (digests) with the readable tree. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("=== executed plan: " + name + " @ " + dir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
