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

  test("a NULL-value match still binds ts and value from the SAME row") {
    // round-6 ADVICE: first(value) and first(when(ts)) could bind to
    // DIFFERENT purchase rows when the first purchase carries a NULL
    // value — ASOF semantics take both columns from the single first
    // matching row. Forward AND backward joins checked.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asofnull")
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      val rows = Seq(
        // user 1: click 10:00 → FIRST purchase 10:30 has NULL value;
        // the 11:00 purchase must NOT leak its value in
        (1L, ts("2026-01-05 10:00:00"), 1L, "click", Some(1.0)),
        (2L, ts("2026-01-05 10:30:00"), 1L, "purchase", None),
        (3L, ts("2026-01-05 11:00:00"), 1L, "purchase", Some(60.0)),
        // user 2: purchase 09:00 → LAST click 08:30 has NULL value;
        // the 08:00 click must NOT leak its value in
        (4L, ts("2026-01-05 08:00:00"), 2L, "click", Some(5.0)),
        (5L, ts("2026-01-05 08:30:00"), 2L, "click", None),
        (6L, ts("2026-01-05 09:00:00"), 2L, "purchase", Some(70.0)))
        .map { case (id, t, u, k, v) => (id, t, u, k, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

      val fwd = AsOfJoin.clicksWithNextPurchase(spark, dir.toString)
        .collect().map(r => r.getLong(0) -> (
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
      assert(fwd(1L) == (None, Some(1800L * 1000000)),
        "value must be the NULL of the first purchase, ts its timestamp")

      val bwd = AsOfJoin.purchasesWithLastClick(spark, dir.toString)
        .collect().map(r => r.getLong(0) -> (
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
      assert(bwd(6L) == (None, Some(1800L * 1000000)),
        "value must be the NULL of the last click, ts its timestamp")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
