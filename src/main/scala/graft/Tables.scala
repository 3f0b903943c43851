package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated testdata star schema
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings — one parquet per table under the sf dir.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it as a
  * nanosecond long (legacy conf) and floor-convert to microseconds, which is
  * exactly what DuckDB's `epoch_us` sees — so oracle comparisons agree.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Change stamp for a table under `dir`: a fold of (path, mtime,
    * length) over the FULL parquet file tree — depth-complete so
    * partitioned layouts are covered, and length-sensitive so a rewrite
    * landing within one filesystem mtime tick still changes the stamp
    * whenever the bytes do. Memo keys include it so an in-place data
    * rewrite invalidates cached derivations instead of serving stale
    * results. (A same-length rewrite inside one mtime tick remains
    * theoretically invisible — mtime granularity is a filesystem
    * property; callers that rewrite that fast should evict explicitly
    * via the release hooks.) */
  def sourceStamp(dir: String, table: String): Long = {
    val root = java.nio.file.Paths.get(s"$dir/$table.parquet")
    if (!java.nio.file.Files.exists(root)) return 0L
    val walk = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      // per-entry hash summed COMMUTATIVELY: directory traversal order is
      // unspecified, and an order-dependent fold would spuriously miss
      // the memo on every call
      walk.iterator().asScala.map { p =>
        val f = p.toFile
        p.toString.hashCode.toLong * 961 + f.lastModified() * 31 + f.length()
      }.sum
    } finally walk.close()
  }

  /** Like [[apply]], but guarantees the table is spread across the cluster
    * before a compute-heavy projection (sha256 chains, regex parses, HOF
    * dot products). The testdata parquet ships as a single row group, so a
    * bare scan is one task no matter what `maxPartitionBytes` says — a
    * round-robin exchange of the (small) source rows buys full parallelism
    * for the expensive downstream work. On a real multi-file 100 TB input
    * the scan already has ≥ cores partitions and this is skipped. */
  def parallel(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = apply(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
