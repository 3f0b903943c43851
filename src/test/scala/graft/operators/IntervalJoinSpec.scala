package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed interval join must be pair-identical to the naive
  * key-equality + range-filter join for every bound shape: lookback,
  * lookahead, and straddling windows, including rows exactly on the
  * half-open boundaries. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def naive(lowerUs: Long, upperUs: Long) = {
    val e = Tables(spark, sf, "events")
    val l = e.select(col("event_id").as("l_id"), col("user_id").as("l_key"),
      unix_micros(col("ts")).as("l_us"))
    val r = e.select(col("event_id").as("r_id"), col("user_id").as("r_key"),
      unix_micros(col("ts")).as("r_us"))
    l.join(r, col("l_key") === col("r_key") &&
        col("r_us") >= col("l_us") + lit(lowerUs) &&
        col("r_us") < col("l_us") + lit(upperUs))
      .select("l_id", "r_id")
  }

  private def bucketed(lowerUs: Long, upperUs: Long) = {
    val e = Tables(spark, sf, "events")
    val l = e.select(col("event_id").as("l_id"), col("user_id").as("l_key"),
      col("ts").as("l_ts"))
    val r = e.select(col("event_id").as("r_id"), col("user_id").as("r_key"),
      col("ts").as("r_ts"))
    IntervalJoin.intervalJoin(l, r, "l_key", "r_key", "l_ts", "r_ts",
      lowerUs, upperUs).select("l_id", "r_id")
  }

  private def assertSame(lowerUs: Long, upperUs: Long): Unit = {
    val n = naive(lowerUs, upperUs)
    val b = bucketed(lowerUs, upperUs)
    assert(b.exceptAll(n).count() == 0, s"extra pairs for [$lowerUs,$upperUs)")
    assert(n.exceptAll(b).count() == 0, s"missing pairs for [$lowerUs,$upperUs)")
  }

  test("lookback window [-1h, 0) matches naive join") {
    assertSame(-3600L * 1000000, 0L)
  }

  test("lookahead window [0, 30min) matches naive join") {
    assertSame(0L, 1800L * 1000000)
  }

  test("straddling window [-15min, 15min) matches naive join") {
    assertSame(-900L * 1000000, 900L * 1000000)
  }

  test("random window bounds match naive join (property)") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 5) {
      // windows from 1 second to ~2 days, anywhere relative to the row
      val width = 1000000L + rnd.nextLong(172800L * 1000000L)
      val lower = rnd.nextLong(2 * width) - width
      assertSame(lower, lower + width)
    }
  }

  test("half-open boundary semantics: exact-lower included, exact-upper excluded") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1000000L)).toDF("l_id", "l_key", "us")
      .select(col("l_id"), col("l_key"), timestamp_micros(col("us")).as("l_ts"))
    val r = Seq(
      (100L, 10L, 0L),        // exactly at l.ts + lower → included
      (101L, 10L, 2000000L),  // exactly at l.ts + upper → excluded
      (102L, 10L, 1999999L),  // one microsecond inside → included
      (103L, 99L, 1000000L))  // wrong key → excluded
      .toDF("r_id", "r_key", "us")
      .select(col("r_id"), col("r_key"), timestamp_micros(col("us")).as("r_ts"))
    val out = IntervalJoin.intervalJoin(l, r, "l_key", "r_key", "l_ts", "r_ts",
        -1000000L, 1000000L)
      .select("r_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(100L, 102L))
  }

  test("gate query plan contains no cartesian or nested-loop join") {
    val plan = IntervalJoin.purchaseClickAttribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
