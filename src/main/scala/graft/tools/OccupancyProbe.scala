package graft.tools

import graft.Tables
import graft.sim.{Ivf, SimilarityQueries => SQ}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the occupancy dials (`SimilarityQueries.planesFor`,
  * `Ivf.nListsFor`) on real corpora: for each input dir, bucket/cell
  * occupancy at the FIXTURE constants vs WITH the dial applied — the
  * evidence that the kNN self-join's Σ n_b² pair work and the IVF/
  * SemDeDup within-cell quadratic stay pinned as the corpus grows
  * (table committed to SCALE_VALIDATION.md).
  *
  * Usage: runMain graft.tools.OccupancyProbe <dir> [<dir> ...]
  */
object OccupancyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-occupancy-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val e = Tables.parallel(spark, dir, "embeddings")
      val n = e.count()

      def lshStats(planes: Int): String = {
        val r = e
          .select(SQ.lshBucket(col("embedding"), 64, planes).as("bucket"))
          .groupBy("bucket").count()
          .agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
            sum(col("count") * col("count")).as("pair_work"))
          .head()
        s"planes=$planes n_buckets=${r.get(0)} max_occ=${r.get(1)} " +
          s"pair_work=${r.get(2)}"
      }

      def ivfStats(nLists: Int): String = {
        // the production assignment path: the literal-argmin expression
        // stops compiling past a few hundred centroid literals (64 KB
        // codegen limit, then interpreted OOM) — see Ivf.assignmentsMl
        val assigned = Ivf.assignmentsMl(spark, dir, nLists)
        val r = assigned.groupBy("cell").count()
          .agg(count(lit(1)).as("n_cells"), max("count").as("max_cell"),
            sum(col("count") * col("count")).as("cell_work"))
          .head()
        s"nlists=$nLists n_cells=${r.get(0)} max_cell=${r.get(1)} " +
          s"cell_work=${r.get(2)}"
      }

      val dialedPlanes = SQ.planesFor(n)
      val dialedLists = Ivf.nListsFor(n)
      println(s"OCC $dir n=$n fixture[${lshStats(SQ.NumPlanes)}] " +
        s"dialed[${lshStats(dialedPlanes)}]")
      println(s"OCC $dir n=$n fixture[${ivfStats(Ivf.NLists)}] " +
        s"dialed[${ivfStats(dialedLists)}]")
    }
    spark.stop()
  }
}
