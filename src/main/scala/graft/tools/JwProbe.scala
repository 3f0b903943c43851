package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dump raw (unrounded) Jaro-Winkler values for every (brand,size)-blocked
  * part-name pair — the cross-engine value-exactness probe backing the
  * fuzzy_jaro_pairs gate (compared bit-for-bit against DuckDB's
  * jaro_winkler_similarity by tools/check_oracle-style replay). */
object JwProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jw(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.JaroWinklerSim(
          org.apache.spark.sql.graft.ColumnBridge.expression(a),
          org.apache.spark.sql.graft.ColumnBridge.expression(b)))
    val p = graft.Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("a_id"), col("b.p_partkey").as("b_id"),
        jw(col("a.p_name"), col("b.p_name")).as("jw"))
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
