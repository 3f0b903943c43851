package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver sweep-line replay of the daily backlog plus the two interval
  * laws: the curve never goes negative, and on any probe day the
  * backlog equals the direct interval count (the days × orders join
  * the sweep-line pattern replaces). */
class BacklogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def intervals(): Seq[(Long, Option[Long])] = {
    val lastShip = graft.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
    graft.Tables(spark, sf, "orders")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS d").collect()
      .map(r => (r.getDate(1).toLocalDate.toEpochDay,
        lastShip.get(r.getLong(0)))).toSeq
  }

  test("curve equals the driver sweep-line replay") {
    val iv = intervals()
    val deltas = scala.collection.mutable.Map[Long, Long]()
    for ((open, close) <- iv) {
      deltas(open) = deltas.getOrElse(open, 0L) + 1
      close.foreach { c0 =>
        val c = math.max(c0, open) // an order cannot close before it opens
        deltas(c + 1) = deltas.getOrElse(c + 1, 0L) - 1
      }
    }
    var run = 0L
    val want = deltas.toSeq.sortBy(_._1).map { case (d, dl) =>
      run += dl
      (java.time.LocalDate.ofEpochDay(d), dl, run)
    }.toSet
    val got = Backlog.orderBacklogDaily(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("non-negative curve; spot days match the direct interval count") {
    val iv = intervals()
    val rows = Backlog.orderBacklogDaily(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(2)))
      .sortBy(_._1)
    assert(rows.forall(_._2 >= 0L))
    // probe a handful of days across the curve
    for ((day, backlog) <- Seq(rows.head, rows(rows.length / 2),
        rows(rows.length / 4), rows.last)) {
      val direct = iv.count { case (open, close) =>
        open <= day && close.forall(c => math.max(c, open) >= day) }
      assert(backlog == direct, s"day $day")
    }
  }
}
