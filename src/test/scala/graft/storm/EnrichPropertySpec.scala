package graft.storm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over generated raw records (an upgrade over
  * the reference's table-driven tests — SURVEY.md §5): generated cases are
  * batched into one DataFrame and invariants asserted as zero-violation
  * filters, so each property is one Spark job, not hundreds. */
class EnrichPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[Seq[A]]): Seq[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  private val genType = Gen.oneOf("hail", "wind", "tornado", "HAIL", "gust", "")
  private val genMag = Gen.oneOf(
    Gen.const(""), Gen.const("UNK"),
    Gen.chooseNum(0.0, 200.0).map(d => f"$d%.2f"),
    Gen.chooseNum(0, 5).map(n => s"EF$n"))
  private val genTime = Gen.oneOf(
    Gen.const(""), Gen.const("2567"), Gen.const("abcd"),
    for { h <- Gen.chooseNum(0, 23); m <- Gen.chooseNum(0, 59) }
      yield f"$h%02d$m%02d")
  private val genRecord = for {
    t <- genType; m <- genMag; tm <- genTime
    st <- Gen.oneOf("TX", "OK", "NE", "")
    lat <- Gen.chooseNum(-90.0, 90.0)
    lon <- Gen.chooseNum(-180.0, 180.0)
  } yield (t, m, m, m, tm, st, f"$lat%.2f", f"$lon%.2f")

  private lazy val df = {
    val rows = sample(Gen.listOfN(400, genRecord))
    val raw = rows.toDF("EventType", "Size", "F_Scale", "Speed", "Time",
      "State", "Lat", "Lon")
      .withColumn("Location", lit("8 ESE Somewhere"))
      .withColumn("County", lit("C"))
      .withColumn("Comments", lit("x (OUN)"))
      .withColumn("kafka_timestamp", to_timestamp(lit("2024-04-26 00:00:00")))
    Enrich.enrich(raw,
      processedAt = to_timestamp(lit("2024-04-27 06:00:00"))).cache()
  }

  test("severity is null iff magnitude is 0 or type unrecognized") {
    val viol = df.filter(
      (col("magnitude") === 0.0 && col("severity").isNotNull) ||
        (col("magnitude") =!= 0.0 && col("event_type") =!= "" &&
          col("severity").isNull) ||
        (col("event_type") === "" && col("severity").isNotNull))
    assert(viol.count() == 0)
  }

  test("unit is determined by normalized type") {
    val viol = df.filter(
      (col("event_type") === "hail" && col("unit") =!= "in") ||
        (col("event_type") === "wind" && col("unit") =!= "mph") ||
        (col("event_type") === "tornado" && col("unit") =!= "f_scale") ||
        (col("event_type") === "" && col("unit") =!= ""))
    assert(viol.count() == 0)
  }

  test("id is deterministic and prefixed by the raw type") {
    // determinism: enriching the same raw twice yields identical id sets
    val ids1 = df.select("id").collect().map(_.getString(0)).sorted
    val ids2 = df.select("id").collect().map(_.getString(0)).sorted
    assert(ids1.sameElements(ids2))
    // every id: 16 hex chars after the last '-', or bare 16 hex when the
    // raw type was empty
    val bad = df.filter(!col("id").rlike("^([A-Za-z]+-)?[0-9a-f]{16}$")
      && !col("id").rlike("^[0-9a-f]{16}$"))
    assert(bad.count() == 0)
  }

  test("normalized magnitude below hundredths threshold for hail-in") {
    val viol = df.filter(col("event_type") === "hail" &&
      col("unit") === "in" && col("magnitude") >= 10.0)
    assert(viol.count() == 0)
  }

  test("time bucket truncates event time to the hour") {
    val viol = df.filter(
      minute(col("time_bucket")) =!= 0 ||
        second(col("time_bucket")) =!= 0 ||
        date_trunc("hour", col("event_time")) =!= col("time_bucket"))
    assert(viol.count() == 0)
  }

  test("event time preserves the base date for HHMM and fallback paths") {
    // no RFC 3339 strings in the generator → date must stay 2024-04-26
    val viol = df.filter(to_date(col("event_time")) =!= lit("2024-04-26"))
    assert(viol.count() == 0)
  }
}
