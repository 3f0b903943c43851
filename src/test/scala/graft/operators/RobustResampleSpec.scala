package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the robust-stats and resampling operators beyond the
  * hash oracle: MAD's breakdown behavior and the forward-fill contract. */
class RobustResampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("outlier_mad: outliers are a strict minority and MAD <= spread") {
    val r = RobustStats.outlierMad(spark, sf).cache()
    // by construction at most half the values can exceed the median
    // deviation, so 3-MAD outliers are always a minority
    assert(r.filter(col("n_outliers") * 2 > col("n")).count() == 0)
    assert(r.filter(col("mad") < 0 || col("med") < 0).count() == 0)
    r.unpersist()
  }

  test("resample_ffill: full grid, fill matches the latest prior event") {
    import spark.implicits._
    val r = Resample.resampleFfill(spark, sf).cache()
    val users = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    val days = r.select("day").distinct().count()
    assert(r.count() == users * days, "grid is not users x days")
    // spot-verify the as-of-midnight contract: for each user's LAST grid
    // day, the fill equals the latest event value with ts <= that midnight
    val lastDay = r.groupBy("user_id").agg(max("day").as("day"))
      .join(r, Seq("user_id", "day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(desc("ts"))
    val bad = lastDay
      .join(Tables(spark, sf, "events").select("user_id", "ts", "value"),
        Seq("user_id"))
      .filter(col("ts") <= to_timestamp(col("day")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("value_ffill") =!= round(col("value"), 2))
    assert(bad.count() == 0)
    // null fills may only appear up to a user's first event day (that
    // day's own midnight point still precedes the event)
    val firstEventDay = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(date_format(min("ts"), "yyyy-MM-dd").as("first_day"))
    val lateNull = r.filter(col("value_ffill").isNull)
      .join(firstEventDay, "user_id")
      .filter(col("day") > col("first_day"))
    assert(lateNull.count() == 0)
    r.unpersist()
  }

  test("winsorize_events: hand values give the exact clamped/trimmed means") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winsor")
    try {
      // values 1..9 and an outlier 100: p10 = 1.9, p90 = 9 + 0.1*91 = 18.1;
      // middle = 2..9 (sum 44) → trimmed 5.5; winsor = (44+1.9+18.1)/10 = 6.4
      val ts0 = java.sql.Timestamp.valueOf("2026-01-05 10:00:00")
      val rows = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex.map {
        case (v, i) => (i.toLong, ts0, 1L, "x", v, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val r = RobustStats.winsorizeEvents(spark, dir.toString).collect()
      assert(r.length == 1)
      val row = r.head
      assert(row.getLong(1) == 10L)
      assert(row.getDouble(2) == 1.9 && row.getDouble(3) == 18.1)
      assert(row.getLong(4) == 1L && row.getLong(5) == 1L)
      assert(row.getLong(6) == 4400L)
      assert(row.getDouble(7) == 6.4, s"winsor ${row.getDouble(7)}")
      assert(row.getDouble(8) == 5.5, s"trimmed ${row.getDouble(8)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
