package graft.tools

import org.apache.spark.sql.SparkSession

/** Time named gate queries through the noop sink, repeated `reps` times
  * (fresh construction each rep), printing per-rep seconds — the
  * targeted A/B harness for optimization work (full-bench runs on this
  * shared box carry ±25% host noise; back-to-back reps of one query
  * pair isolate a change from the weather).
  *
  * Usage: runMain graft.tools.QueryTime <sfDir> <reps> q1,q2,…
  * Memos warm on the first (untimed) pass so reps measure steady state.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      runOne(n) // warm-up: memos + codegen
      val times = (1 to reps).map(_ => runOne(n))
      println(f"[qtime] $n reps=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
