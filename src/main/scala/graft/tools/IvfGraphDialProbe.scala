package graft.tools
import graft.sim.{Ivf, KnnGraphIvf}
import org.apache.spark.sql.SparkSession
object IvfGraphDialProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val n = graft.Tables(spark, dir, "embeddings").count()
      Seq(("fixture", Ivf.NLists), ("dialed", Ivf.nListsFor(n))).foreach {
        case (tag, nl) =>
          val t0 = System.nanoTime()
          val edges =
            if (nl == Ivf.NLists) KnnGraphIvf.knnGraphIvf(spark, dir).count()
            else KnnGraphIvf.knnGraphIvfDialed(spark, dir, nl).count()
          println(f"DIAL $dir n=$n $tag nlists=$nl edges=$edges wall=${(System.nanoTime()-t0)/1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
