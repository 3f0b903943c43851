// Scratch perf probe: sbt "runMain graft.tools.ProbeEnrich" (not shipped API)
package graft.tools

import graft.storm.{Enrich, StormQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeEnrich {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val raw = StormQueries.syntheticRaw(spark, dir).cache()
    raw.write.format("noop").mode("overwrite").save() // materialize
    time("syntheticRaw (cached scan)") {
      raw.write.format("noop").mode("overwrite").save()
    }
    val pa = to_timestamp(lit("2024-02-01 00:00:00"))
    time("full enrich") {
      Enrich.enrich(raw, processedAt = pa).write.format("noop").mode("overwrite").save()
    }
    time("id only") {
      raw.select(Enrich.generateId(col("EventType"), col("State"),
        Enrich.floatOrZero(col("Lat")), Enrich.floatOrZero(col("Lon")),
        col("Time"), Enrich.magnitude(col("EventType"), col("Size"),
          col("F_Scale"), col("Speed"))).as("id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("eventTime only") {
      raw.select(Enrich.eventTime(col("kafka_timestamp"), col("Time")).as("t"))
        .write.format("noop").mode("overwrite").save()
    }
    time("location trio only") {
      raw.select(Enrich.locationName(col("Location")),
        Enrich.locationDistance(col("Location")),
        Enrich.locationDirection(col("Location")))
        .write.format("noop").mode("overwrite").save()
    }
    time("office only") {
      raw.select(Enrich.sourceOffice(col("Comments")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = StormQueries.syntheticRaw(spark, "/root/testdata/sf0.001")
    val plan = Enrich.enrich(raw,
      processedAt = to_timestamp(lit("2024-02-01 00:00:00")))
      .queryExecution.optimizedPlan.toString
    println("PROJECTS=" + plan.linesIterator.count(_.trim.startsWith("Project")))
    println("GETTS=" + "gettimestamp".r.findAllIn(plan.toLowerCase).size)
    println("SHA2=" + "sha2".r.findAllIn(plan.toLowerCase).size)
    println("CASEWHEN_MAG=" + "upper\\(trim\\(".r.findAllIn(plan).size)
    spark.stop()
  }
}
object ProbeQ13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.operators.RelationalQueries
      .q13TopEventsPerType(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("WindowGroupLimit") || l.contains("Window"))
      .mkString("\n"))
    spark.stop()
  }
}
object ProbeQ3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.operators.RelationalQueries
    time("q3 warm") { RelationalQueries.q3RevenueByNation(spark, dir)
      .write.format("noop").mode("overwrite").save() }
    time("q3 asis") { RelationalQueries.q3RevenueByNation(spark, dir)
      .write.format("noop").mode("overwrite").save() }
    time("q3 parallel-fact") {
      val li = graft.Tables.parallel(spark, dir, "lineitem")
      li.join(org.apache.spark.sql.functions.broadcast(graft.Tables(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(org.apache.spark.sql.functions.broadcast(graft.Tables(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(org.apache.spark.sql.functions.broadcast(graft.Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 asis") { RelationalQueries.q1PricingSummary(spark, dir)
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
