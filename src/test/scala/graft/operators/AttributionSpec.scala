package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Attribution models on a planted timeline: window membership is
  * inclusive of the purchase instant and bounded below, ranks run from
  * the most recent click, and both weight models are the exact
  * hand-computed fractions that sum to 1 per purchase. */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planted timeline: U-shaped and linear credit, windows honored") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr")
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      val rows = Seq(
        // user 1: 4 clicks in window, 1 outside (09:00 is > 1h before)
        (1L, ts("2026-01-05 09:00:00"), 1L, "click", 1.0),
        (2L, ts("2026-01-05 10:10:00"), 1L, "click", 1.0),
        (3L, ts("2026-01-05 10:20:00"), 1L, "click", 1.0),
        (4L, ts("2026-01-05 10:30:00"), 1L, "click", 1.0),
        (5L, ts("2026-01-05 11:00:00"), 1L, "click", 1.0), // = purchase ts
        (6L, ts("2026-01-05 11:00:00"), 1L, "purchase", 9.0),
        // user 2: single touch
        (7L, ts("2026-01-05 08:30:00"), 2L, "click", 1.0),
        (8L, ts("2026-01-05 09:00:00"), 2L, "purchase", 5.0),
        // user 3: two touches
        (9L, ts("2026-01-05 08:00:00"), 3L, "click", 1.0),
        (10L, ts("2026-01-05 08:20:00"), 3L, "click", 1.0),
        (11L, ts("2026-01-05 08:40:00"), 3L, "purchase", 5.0))
        .map { case (id, t, u, k, v) => (id, t, u, k, v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = Attribution.attributionWeights(spark, dir.toString)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
        .toMap

      // purchase 6: clicks 2,3,4,5 (09:00 excluded); last = 5
      assert(!got.contains((6L, 1L)), "click outside the window leaked in")
      assert(got((6L, 5L)) == ((4L, 1L, 0.25, 0.4)))
      assert(got((6L, 4L)) == ((4L, 2L, 0.25, 0.1)))
      assert(got((6L, 3L)) == ((4L, 3L, 0.25, 0.1)))
      assert(got((6L, 2L)) == ((4L, 4L, 0.25, 0.4)))
      // purchase 8: single touch gets all credit
      assert(got((8L, 7L)) == ((1L, 1L, 1.0, 1.0)))
      // purchase 11: two touches split evenly in BOTH models
      assert(got((11L, 10L)) == ((2L, 1L, 0.5, 0.5)))
      assert(got((11L, 9L)) == ((2L, 2L, 0.5, 0.5)))
      // each purchase's weights sum to 1 under both models
      got.toSeq.groupBy(_._1._1).foreach { case (p, ts2) =>
        Seq(3, 4).foreach { i =>
          val s = ts2.map(_._2.productElement(i - 1).asInstanceOf[Double]).sum
          assert(math.abs(s - 1.0) < 1e-9, s"purchase $p model col $i sums $s")
        }
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
