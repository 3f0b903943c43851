package graft.operators

import graft.{SparkTestSession, Tables}
import graft.dedup.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-3 relational/dedup operators: pivot totals,
  * session-window geometry, profile consistency, and the cross-document
  * n-gram bounds. */
class PivotSessionProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q23 pivot cells sum to the orders row count") {
    import spark.implicits._
    val p = RelationalQueries.q23StatusPriorityPivot(spark, sf)
    val cellSum = p.select(
      RelationalQueries.OrderPriorities.map(c => sum(col(c))).reduce(_ + _))
      .as[Long].head()
    assert(cellSum == Tables(spark, sf, "orders").count())
  }

  test("q24 session windows partition events and respect the 30-minute gap") {
    import spark.implicits._
    val s = RelationalQueries.q24SessionWindow(spark, sf).cache()
    // totality: every event lands in exactly one session
    assert(s.agg(sum("n_events")).as[Long].head() ==
      Tables(spark, sf, "events").count())
    // separation: consecutive sessions of a user never overlap — the next
    // session starts at or after the previous end (end = last event + gap)
    val overlap = s.as("a").join(s.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.s_start") < col("b.s_start") &&
        col("b.s_start") < col("a.s_end"))
    assert(overlap.count() == 0)
    // geometry: a session spans at least the gap (end >= start + 30 min)
    assert(s.filter(
      unix_timestamp(col("s_end")) - unix_timestamp(col("s_start")) < 1800L)
      .count() == 0)
    s.unpersist()
  }

  test("q24 exact-gap boundary: 1801 s later is a new session, 1800 s is not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sessboundary")
    try {
      val base = 1700000000L // epoch seconds
      def ns(sec: Long) = sec * 1000000000L // Tables reads events.ts as nanos
      Seq((1L, ns(base), 1.0), (1L, ns(base + 1801), 1.0), // just past the gap
        (2L, ns(base), 1.0), (2L, ns(base + 1800), 1.0)) // exactly the gap
        .toDF("user_id", "ts", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val perUser = RelationalQueries.q24SessionWindow(spark, dir.toString)
        .groupBy("user_id").count().as[(Long, Long)].collect().toMap
      assert(perUser(1L) == 2L, "a strictly-larger gap must open a NEW session")
      assert(perUser(2L) == 1L, "an exactly-gap event must EXTEND the session")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("profile_categorical agrees with direct per-column aggregates") {
    import spark.implicits._
    val prof = RelationalQueries.profileCategorical(spark, sf).cache()
    val orders = Tables(spark, sf, "orders").cache()
    for (c <- Seq("o_orderstatus", "o_orderpriority")) {
      val row = prof.filter(col("column_name") === c).head()
      assert(row.getAs[Long]("n_nonnull") ==
        orders.filter(col(c).isNotNull).count())
      assert(row.getAs[Long]("n_distinct") ==
        orders.filter(col(c).isNotNull).select(c).distinct().count())
      val top = orders.groupBy(col(c)).count()
        .orderBy(desc("count"), asc(c)).head()
      assert(row.getAs[String]("top_value") == top.getString(0))
      assert(row.getAs[Long]("top_n") == top.getLong(1))
    }
    orders.unpersist(); prof.unpersist()
  }

  test("cross_doc_ngrams fractions are bounded and cover shingled docs") {
    val x = DedupQueries.crossDocNgrams(spark, sf).cache()
    assert(x.filter(col("n_shared") > col("n_grams") ||
      col("shared_frac") < 0 || col("shared_frac") > 1).count() == 0)
    // exact duplicates (the planted dup pairs) must be fully shared
    assert(x.filter(col("shared_frac") === 1.0).count() > 0)
    x.unpersist()
  }
}
