package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Retention triangle on a planted timeline: cohorts bind to the Monday
  * week start of each user's FIRST event, offsets count whole weeks, a
  * user active twice in one week counts once, and cohort size appears at
  * offset 0. */
class CohortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("planted two-cohort timeline yields the exact triangle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cohort")
    try {
      // 2026-01-05 and 2026-01-12 are Mondays.
      val events = Seq(
        // user 1: first event Wed wk0 → cohort 2026-01-05; active wk0 ×2, wk2
        (1L, ts("2026-01-07 10:00:00")), (1L, ts("2026-01-09 11:00:00")),
        (1L, ts("2026-01-20 09:00:00")),
        // user 2: same cohort, only wk0
        (2L, ts("2026-01-05 00:00:00")),
        // user 3: cohort 2026-01-12, active wk0 and wk1
        (3L, ts("2026-01-14 12:00:00")), (3L, ts("2026-01-19 23:59:59")))
        .map { case (u, t) => (u * 100, t, u, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      events.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Cohort.cohortRetention(spark, dir.toString).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got == Map(
        ("2026-01-05", 0L) -> (2L, 3L), // users 1,2; 3 events in wk0
        ("2026-01-05", 2L) -> (1L, 1L), // user 1 returns in week 2
        ("2026-01-12", 0L) -> (1L, 1L),
        ("2026-01-12", 1L) -> (1L, 1L)), s"got $got")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
