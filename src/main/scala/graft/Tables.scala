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
}
