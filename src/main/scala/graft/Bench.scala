package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is forced through a `noop` sink so the full projection is
  * computed (a count() would let Catalyst prune per-row outputs to nothing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/session so the first measured query doesn't pay startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Compile the largest codegen unit (the storm enrich projection) once,
    // un-timed: its first-run whole-stage-codegen + JIT is several seconds
    // of ONE-TIME cost that would otherwise be attributed to whichever
    // storm query happens to run first alphabetically. Prefer the sibling
    // sf0.001 dir for a near-free warm-up; fall back to the bench dir
    // itself so the warm-up is never silently skipped on other layouts.
    val warmDir = {
      val tiny = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (tiny.isDirectory) tiny.getPath else sfDir
    }
    try graft.storm.StormQueries
      .queries("storm_enrich")(spark, warmDir)
      .write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] enrich warm-up on $warmDir failed: ${e.getMessage}")
    }
    // Shuffle accounting per query: wall time alone can't tell a plan
    // regression from machine weather, but bytes shuffled is a pure plan
    // property — a new exchange shows up here even on a noisy box.
    // Attribution is EXACT via job groups: every query's actions run
    // under setJobGroup(name), onJobStart records which stages belong to
    // which group (AQE's re-planned jobs inherit the thread-local group),
    // and stage-completed events credit their own group no matter how
    // late the async listener bus delivers them. One drain at the end
    // replaces the old per-query 100 ms stability polls and their 2 s
    // misattribution cap.
    val totalBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val groupBytes =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val groupRecs =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val g =
            if (js.properties == null) null
            else js.properties.getProperty("spark.jobGroup.id")
          if (g != null)
            js.stageInfos.foreach(si => stageGroup.put(si.stageId, g))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            val b = m.shuffleWriteMetrics.bytesWritten
            val r = m.shuffleWriteMetrics.recordsWritten
            totalBytes.addAndGet(b)
            val g = stageGroup.get(sc.stageInfo.stageId)
            if (g != null) {
              groupBytes
                .computeIfAbsent(g, _ => new java.util.concurrent.atomic.AtomicLong)
                .addAndGet(b)
              groupRecs
                .computeIfAbsent(g, _ => new java.util.concurrent.atomic.AtomicLong)
                .addAndGet(r)
            }
          }
        }
      })
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      } finally spark.sparkContext.clearJobGroup()
      (name, (System.nanoTime() - t0) / 1e9)
    }
    // single end-of-run drain: wait for the listener bus to go quiet so
    // every stage-completed event has credited its group
    var last = -1L
    var stable = 0
    var waited = 0
    while (stable < 4 && waited < 10000) {
      Thread.sleep(50L); waited += 50
      val cur = totalBytes.get()
      if (cur == last) stable += 1 else { stable = 0; last = cur }
    }
    def mbOf(name: String): Double =
      Option(groupBytes.get(name)).fold(0.0)(_.get() / 1048576.0)
    def recOf(name: String): Long =
      Option(groupRecs.get(name)).fold(0L)(_.get())
    val qs = timed.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val sh = timed.map { case (k, _) => "\"" + k + f"\":${mbOf(k)}%.1f" }
      .mkString("{", ",", "}")
    val rec = timed.map { case (k, _) => "\"" + k + s"""":${recOf(k)}""" }
      .mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"shuffle_mb":$sh,"shuffle_rec":$rec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
