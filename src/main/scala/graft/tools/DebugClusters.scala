package graft.tools

import graft.sim.SimilarityQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch: instrumented copy of the CC loop to find the x30
  * no-broadcast hang. */
object DebugClusters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x30"
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val edges = t("edges-build") {
      SimilarityQueries.dedupEmbeddingCosine(spark, dir)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .localCheckpoint(true)
    }
    println("edges=" + edges.count())

    // instrumented copy of ConnectedComponents.connectedComponents
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val bidir = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = t("init") {
      bidir.groupBy(col("src").as("id"))
        .agg(min("dst").as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("comp"))
        .localCheckpoint(true)
    }
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = t("sum0")(labelSum(labels))
    var iter = 0
    var converged = false
    while (iter < 25 && !converged) {
      val neighborMin = bidir
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("neighbor_comp"))
      val viaLabel = labels.as("l")
        .join(labels.as("m"), col("l.comp") === col("m.id"))
        .select(col("l.id").as("id"), col("m.comp").as("comp_of_comp"))
      val next = t(s"round-$iter") {
        labels
          .join(neighborMin, Seq("id"), "left")
          .join(viaLabel, Seq("id"), "left")
          .select(col("id"), least(
              col("comp"),
              coalesce(col("neighbor_comp"), col("comp")),
              coalesce(col("comp_of_comp"), col("comp"))).as("comp"))
          .localCheckpoint(true)
      }
      val s = t(s"sum-$iter")(labelSum(next))
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    println("iters=" + iter + " labels=" + labels.count())
    spark.stop()
  }
}
