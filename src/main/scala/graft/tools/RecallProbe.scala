package graft.tools

import graft.Tables
import graft.sim.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the kNN-graph recall dial: edge recall of the single-probe
  * and Hamming-1 multiprobe graphs against the brute-force exact kNN
  * graph (the ground truth an index-free build would produce). Prints
  * one JSON line per corpus dir. The brute-force N² pass is a PROBE
  * cost only — the production path is exactly what is being graded.
  *
  * `sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.1"`
  */
object RecallProbe {

  /** Exact kNN edges via one self cross join + per-vector rank window —
    * N² scored pairs, probe-only. */
  private def bruteEdges(s: SparkSession, dir: String): DataFrame = {
    import SimilarityQueries.dot
    val e = Tables.parallel(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SimilarityQueries.KnnK)
      .select("a_id", "b_id", "cos")
  }

  /** Cosine cuts: 0.4 is the `dedup_embedding_cosine` verify bound;
    * 0.95 is the true near-duplicate regime where sign-LSH collision
    * probability (1 − θ/π)^planes is actually high — the regime the
    * bucketing is designed for. */
  val VerifyCos = 0.4
  val NearDupCos = 0.95

  private def recallOf(graph: DataFrame, brute: DataFrame)
      : (Double, Double, Double) = {
    def r(truth: DataFrame): Double = {
      val total = truth.count()
      if (total == 0) 1.0
      else truth.join(graph.select("a_id", "b_id"), Seq("a_id", "b_id"))
        .count().toDouble / total
    }
    (r(brute), r(brute.filter(col("cos") >= VerifyCos)),
      r(brute.filter(col("cos") >= NearDupCos)))
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val brute = bruteEdges(spark, dir).cache()
      brute.count()
      val (s, sV, sN) =
        recallOf(SimilarityQueries.knnGraphLsh(spark, dir), brute)
      val (m, mV, mN) =
        recallOf(SimilarityQueries.knnGraphMultiprobe(spark, dir), brute)
      val (iv, ivV, ivN) =
        recallOf(graft.sim.KnnGraphIvf.knnGraphIvf(spark, dir), brute)
      brute.unpersist()
      println(f"""{"dir":"$dir","k":${SimilarityQueries.KnnK},""" +
        f""""recall_single":$s%.4f,"recall_multiprobe":$m%.4f,""" +
        f""""recall_ivf":$iv%.4f,""" +
        f""""cos04_single":$sV%.4f,"cos04_multiprobe":$mV%.4f,""" +
        f""""cos04_ivf":$ivV%.4f,""" +
        f""""cos095_single":$sN%.4f,"cos095_multiprobe":$mN%.4f,""" +
        f""""cos095_ivf":$ivN%.4f}""")
    }
    spark.stop()
  }
}
