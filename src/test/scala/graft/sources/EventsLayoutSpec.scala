package graft.sources

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The dual-layout contract of the `events.ts` reader: driver testdata
  * has shipped the column both as TIMESTAMP(NANOS) (readable only as a
  * nanos long) and as plain timestamp[us] (TIMESTAMP_NTZ). `Tables`
  * dispatches on the read dtype — both layouts must produce the SAME
  * session-zone instants, so every downstream window/session/oracle is
  * layout-independent. */
class EventsLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("nanos-long and timestamp layouts read to identical instants") {
    // current driver layout, whatever it is
    val now = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(now.schema("ts").dataType == TimestampType)

    // synthesize the LEGACY layout from it: ts as nanosecond epoch long
    val dirPath = Files.createTempDirectory("events_nanos")
    val dir = dirPath.toString
    try {
      val legacy = now.withColumn("ts",
        (unix_micros(col("ts")) * 1000L).as("ts"))
      legacy.write.mode("overwrite").parquet(s"$dir/events.parquet")

      val back = Tables(spark, dir, "events")
      assert(back.schema("ts").dataType == TimestampType)
      val diff = now.select("event_id", "ts")
        .exceptAll(back.select("event_id", "ts")).count()
      assert(diff == 0, s"$diff instants diverged between layouts")
      assert(back.count() == now.count())
    } finally {
      // don't leak a parquet copy of events per test run
      import scala.jdk.CollectionConverters._
      Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
