package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Forward as-of join on a planted timeline: each click binds to the
  * FIRST purchase at-or-after it for the same user, a simultaneous
  * purchase counts, later clicks with no following purchase stay null,
  * and users never cross. */
class AsOfForwardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("first at-or-after purchase per user; no purchase → null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asoffwd")
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      val rows = Seq(
        // user 1: click 10:00 → purchase 10:30 (not 11:00); click 12:00 → null
        (1L, ts("2026-01-05 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2026-01-05 10:30:00"), 1L, "purchase", 50.0),
        (3L, ts("2026-01-05 11:00:00"), 1L, "purchase", 60.0),
        (4L, ts("2026-01-05 12:00:00"), 1L, "click", 2.0),
        // user 2: purchase at the exact click instant counts (ts <= ts)
        (5L, ts("2026-01-05 09:00:00"), 2L, "click", 3.0),
        (6L, ts("2026-01-05 09:00:00"), 2L, "purchase", 70.0),
        // user 3: purchase BEFORE the click must not match backward
        (7L, ts("2026-01-05 08:00:00"), 3L, "purchase", 80.0),
        (8L, ts("2026-01-05 09:00:00"), 3L, "click", 4.0))
        .map { case (id, t, u, k, v) => (id, t, u, k, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = AsOfJoin.clicksWithNextPurchase(spark, dir.toString)
        .collect().map { r =>
          r.getLong(0) -> (
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))
        }.toMap
      assert(got(1L) == (Some(50.0), Some(1800L * 1000000)))
      assert(got(4L) == (None, None))
      assert(got(5L) == (Some(70.0), Some(0L)))
      assert(got(8L) == (None, None), "must not match a PRIOR purchase")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
