package graft.tools

import graft.ShuffleByGroup
import graft.sim.{GraphStats, LabelProp, SimilarityQueries}
import org.apache.spark.sql.SparkSession

/** Measures the graph-analytics families END-TO-END with the LSH plane
  * dial applied (round-6 verdict #5): the x10/x30 `label_prop_knn` /
  * `knn_triangle_stats` walls were dominated by the shared kNN build at
  * FIXTURE planes, where bucket occupancy grows ∝N. This probe rebuilds
  * the mutual-kNN graph at `planesFor(N)` per corpus, materializes it
  * once (the memoized-gate discipline), then runs label propagation and
  * triangle stats over it, reporting per-stage wall + shuffle records.
  *
  * `sbt "runMain graft.tools.GraphDialProbe /root/testdata/sf0.1
  *   /tmp/graft_scale/x10 /tmp/graft_scale/x30"`
  */
object GraphDialProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphDialProbe <dir> ...")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffle = new ShuffleByGroup
    spark.sparkContext.addSparkListener(shuffle)

    args.foreach { dir =>
      val n = graft.Tables(spark, dir, "embeddings").count()
      val planes = SimilarityQueries.planesFor(n)

      def stage(name: String)(body: => Long): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        var out = 0L
        shuffle.measure(spark.sparkContext, s"$dir|$name") { out = body }
        shuffle.drain()
        ((System.nanoTime() - t0) / 1e9, shuffle.recOf(s"$dir|$name"), out)
      }

      // graph build at the dialed plane count, materialized once
      var edges: org.apache.spark.sql.DataFrame = null
      val (bw, br, bn) = stage("build") {
        edges = GraphStats.mutualEdgesDialed(spark, dir).localCheckpoint(true)
        edges.count()
      }
      val (lw, lr, ln) = stage("labelprop") {
        LabelProp.propagatedOver(spark, dir, edges)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      val (tw, tr, tn) = stage("triangles") {
        GraphStats.triangleStatsOver(edges)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      println(
        f"""{"dir":"$dir","n":$n,"planes":$planes,"edges":$bn,""" +
          f""""build":{"sec":$bw%.2f,"shuffle_rec":$br},""" +
          f""""label_prop":{"sec":$lw%.2f,"shuffle_rec":$lr},""" +
          f""""triangle_stats":{"sec":$tw%.2f,"shuffle_rec":$tr}}""")
    }
    spark.stop()
  }
}
