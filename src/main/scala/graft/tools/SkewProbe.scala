package graft.tools

import graft.operators.SkewJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures AQE's native skew-join split against the manual salted join
  * (`SkewJoin.saltedJoin`) on corpora with a PLANTED hot key, and the
  * aggregation-skew case AQE cannot split — evidence for the
  * SCALE_VALIDATION.md rule on when the manual salt is still required.
  *
  * Skew is planted by remapping ~20 % of lineitem rows onto one hot
  * orderkey (content-hash based, deterministic). Broadcast joins are
  * disabled so the join is a genuine shuffle join at every corpus size —
  * the regime a 100 TB fact↔fact join lives in. AQE's skew thresholds
  * are lowered (8 MB / factor 2) so the splitter can SEE skew at probe
  * scale; production keeps the defaults and hits them naturally.
  *
  * Usage: runMain graft.tools.SkewProbe <dir> [<dir> ...]
  */
object SkewProbe {

  /** Per-task straggler metric: the MAX shuffle-read record count of any
    * single task in a job group. Wall time on a shared local[32] JVM is
    * weather; the hot reducer's row count is a pure plan property —
    * plain join concentrates the hot key on one task, AQE splits its
    * reads, the salt spreads it over k tasks. */
  final class MaxTaskRead extends org.apache.spark.scheduler.SparkListener {
    private val stageGroup =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    private val maxByGroup =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    private val maxBytesByGroup =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val g =
        if (js.properties == null) null
        else js.properties.getProperty("spark.jobGroup.id")
      if (g != null)
        js.stageInfos.foreach(si => stageGroup.put(si.stageId, g))
    }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val g = stageGroup.get(te.stageId)
      if (g != null && te.taskMetrics != null) {
        val sr = te.taskMetrics.shuffleReadMetrics
        maxByGroup
          .computeIfAbsent(g, _ => new java.util.concurrent.atomic.AtomicLong)
          .accumulateAndGet(sr.recordsRead, math.max _)
        // bytes catch aggregation skew records can't: a partial
        // collect_list is ONE record however many values it carries
        maxBytesByGroup
          .computeIfAbsent(g, _ => new java.util.concurrent.atomic.AtomicLong)
          .accumulateAndGet(sr.totalBytesRead, math.max _)
      }
    }
    def maxOf(key: String): Long =
      Option(maxByGroup.get(key)).fold(0L)(_.get())
    def maxBytesOf(key: String): Long =
      Option(maxBytesByGroup.get(key)).fold(0L)(_.get())
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxRead = new MaxTaskRead
    spark.sparkContext.addSparkListener(maxRead)

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)

    def grouped[A](key: String)(body: => A): A = {
      spark.sparkContext.setJobGroup(key, key, interruptOnCancel = false)
      try body finally spark.sparkContext.clearJobGroup()
    }

    // two runs per config: r1 pays JIT/page-cache warm-up, r2 is the
    // comparable number — single cold runs mis-ranked configs by 2×
    def timed(body: => Long): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      val n1 = body
      val t1 = System.nanoTime()
      val n2 = body
      val t2 = System.nanoTime()
      require(n1 == n2, s"nondeterministic result: $n1 vs $n2")
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, n2)
    }

    args.foreach { dir =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val hotKey = orders.select(min("o_orderkey")).head().getLong(0)
      // ~20 % of fact rows collapse onto one key — content-hash salt
      // semantics (deterministic under retry), same rule saltedJoin uses
      val skewed = li.withColumn("l_orderkey",
        when(pmod(hash(li.columns.map(col): _*), lit(5)) === 0, lit(hotKey))
          .otherwise(col("l_orderkey")))

      var lastPlanHadSkewSplit = false
      def joinAgg(j: DataFrame): Long = {
        val agg = j.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val n = agg.collect().map(_.getAs[Long]("n")).sum
        // post-execution adaptive plan shows whether AQE split the reads
        // OptimizeSkewedJoin marks the join "(skew=true)" and the reads
        // "AQEShuffleRead ... skewed" — match either
        lastPlanHadSkewSplit =
          agg.queryExecution.executedPlan.toString.toLowerCase.contains("skew")
        n
      }

      def aqe(on: Boolean): Unit = {
        conf("spark.sql.adaptive.enabled", on.toString)
        conf("spark.sql.adaptive.skewJoin.enabled", on.toString)
        // see skew at probe scale (production: defaults, same mechanism)
        conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "8m")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      }

      // (a) plain shuffle join, no AQE — the skewed straggler baseline
      aqe(on = false)
      val (tPlain1, tPlain, nPlain) = grouped(s"plain-$dir")(timed(joinAgg(
        skewed.join(orders, skewed("l_orderkey") === orders("o_orderkey")))))

      // (b) AQE skew-join split
      aqe(on = true)
      val (tAqe1, tAqe, nAqe) = grouped(s"aqe-$dir")(timed(joinAgg(
        skewed.join(orders, skewed("l_orderkey") === orders("o_orderkey")))))
      val aqeSplit = lastPlanHadSkewSplit

      // (c) manual salt (k=8), no AQE
      aqe(on = false)
      val (tSalt1, tSalt, nSalt) = grouped(s"salt-$dir")(timed(joinAgg(
        SkewJoin.saltedJoin(skewed, orders, "l_orderkey", "o_orderkey", 8))))

      require(nPlain == nAqe && nPlain == nSalt,
        s"row counts diverged: $nPlain / $nAqe / $nSalt")
      println(f"SKEWJOIN $dir rows=$nPlain " +
        f"max_task_rows plain=${maxRead.maxOf(s"plain-$dir")} " +
        f"aqe=${maxRead.maxOf(s"aqe-$dir")} (split=$aqeSplit) " +
        f"salted=${maxRead.maxOf(s"salt-$dir")} | " +
        f"warm_wall plain=$tPlain%.1fs aqe=$tAqe%.1fs salted=$tSalt%.1fs " +
        f"[cold: $tPlain1%.1f/$tAqe1%.1f/$tSalt1%.1f]")

      // Aggregation skew: collect_list partials do NOT collapse (the hot
      // key's reducer receives every value), and AQE's skew splitter
      // only rewrites join reads — it cannot split an aggregation.
      def directAgg(): Long = {
        val r = skewed.groupBy("l_orderkey")
          .agg(size(collect_list(col("l_extendedprice"))).as("n"))
        r.agg(max("n")).head().getInt(0).toLong
      }
      // the salt fix: two-stage — collect per (key, salt), merge sizes
      def saltedAgg(): Long = {
        val r = skewed
          .withColumn("_salt",
            pmod(hash(skewed.columns.map(col): _*), lit(8)))
          .groupBy("l_orderkey", "_salt")
          .agg(size(collect_list(col("l_extendedprice"))).as("n_part"))
          .groupBy("l_orderkey")
          .agg(sum("n_part").as("n"))
        r.agg(max("n")).head().getLong(0)
      }
      aqe(on = true) // give AQE every chance on the direct path
      val (tDirect1, tDirect, maxDirect) =
        grouped(s"agg-direct-$dir")(timed(directAgg()))
      val (tSaltAgg1, tSaltAgg, maxSalt) =
        grouped(s"agg-salt-$dir")(timed(saltedAgg()))
      require(maxDirect == maxSalt,
        s"hot-key cardinality diverged: $maxDirect vs $maxSalt")
      println(f"SKEWAGG $dir hot_n=$maxDirect " +
        f"max_task_read_mb direct=${maxRead.maxBytesOf(s"agg-direct-$dir") / 1048576.0}%.1f " +
        f"salted=${maxRead.maxBytesOf(s"agg-salt-$dir") / 1048576.0}%.1f | " +
        f"warm_wall direct=$tDirect%.1fs salted_2stage=$tSaltAgg%.1fs " +
        f"[cold: $tDirect1%.1f/$tSaltAgg1%.1f]")
    }
    spark.stop()
  }
}
