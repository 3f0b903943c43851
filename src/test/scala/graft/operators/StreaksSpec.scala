package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replay of the gap-and-islands day streaks: collect each
  * user's distinct active dates, split into maximal consecutive runs
  * driver-side, and pin the engine's per-user profile. */
class StreaksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def runs(days: Seq[java.time.LocalDate])
      : Seq[(java.time.LocalDate, Long)] = {
    val sorted = days.distinct.sorted
    sorted.foldLeft(List.empty[(java.time.LocalDate, Long)]) {
      case ((start, len) :: rest, d)
          if start.plusDays(len) == d => (start, len + 1) :: rest
      case (acc, d) => (d, 1L) :: acc
    }.reverse
  }

  test("per-user streak profile equals the driver replay") {
    val byUser = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "cast(ts as date) as d").collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
      .groupBy(_._1).map { case (u, xs) => u -> runs(xs.map(_._2)) }
    val want = byUser.map { case (u, rs) =>
      val maxLen = rs.map(_._2).max
      (u, rs.map(_._2).sum, rs.size.toLong, maxLen,
        rs.filter(_._2 == maxLen).map(_._1).min(
          Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
    }.toSet
    val got = Streaks.userStreaks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toLocalDate)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("active days across users equals the distinct (user, day) count") {
    val total = Streaks.userStreaks(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("active_days"))
      .collect()(0).getLong(0)
    val distinctDays = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "cast(ts as date)").distinct().count()
    assert(total == distinctDays)
  }
}
