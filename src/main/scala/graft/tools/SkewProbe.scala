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

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
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

      def joinAgg(j: DataFrame): Long =
        j.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .collect().map(_.getAs[Long]("n")).sum

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
      val (tPlain, nPlain) = timed(joinAgg(
        skewed.join(orders, skewed("l_orderkey") === orders("o_orderkey"))))

      // (b) AQE skew-join split
      aqe(on = true)
      val (tAqe, nAqe) = timed(joinAgg(
        skewed.join(orders, skewed("l_orderkey") === orders("o_orderkey"))))

      // (c) manual salt (k=8), no AQE
      aqe(on = false)
      val (tSalt, nSalt) = timed(joinAgg(
        SkewJoin.saltedJoin(skewed, orders, "l_orderkey", "o_orderkey", 8)))

      require(nPlain == nAqe && nPlain == nSalt,
        s"row counts diverged: $nPlain / $nAqe / $nSalt")
      println(f"SKEWJOIN $dir rows=$nPlain plain=$tPlain%.1fs " +
        f"aqe_split=$tAqe%.1fs salted=$tSalt%.1fs")

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
      val (tDirect, maxDirect) = timed(directAgg())
      val (tSaltAgg, maxSalt) = timed(saltedAgg())
      require(maxDirect == maxSalt,
        s"hot-key cardinality diverged: $maxDirect vs $maxSalt")
      println(f"SKEWAGG $dir hot_n=$maxDirect direct=$tDirect%.1fs " +
        f"salted_2stage=$tSaltAgg%.1fs")
    }
    spark.stop()
  }
}
