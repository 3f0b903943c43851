package graft.storm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch fixture-generator equivalent of the reference's `cmd/genmock`
  * (SURVEY.md §3.2): NOAA SPC per-type CSVs → trimmed raw records with the
  * event type injected (S5) → union (J1) → the shared enrichment →
  * JSON-array fixtures (S7) → a stats report (A1–A5, F3–F4, O1–O2).
  *
  * The one architectural invariant carried over: this path reuses the
  * exact production transform ([[Enrich.enrich]]) — fixtures and the
  * streaming pipeline can never drift apart (`cmd/genmock/main.go:2-4`).
  */
object GenMock {

  /** (csv file stem, event type, magnitude column) table —
    * `cmd/genmock/main.go:54-58`. */
  val fileDefs: Seq[(String, String, String)] = Seq(
    ("240426_rpts_hail", "hail", "Size"),
    ("240426_rpts_torn", "tornado", "F_Scale"),
    ("240426_rpts_wind", "wind", "Speed"))

  /** S5: read one NOAA CSV (header row), trim every cell, inject the event
    * type, fill the magnitude columns the file doesn't carry with "".
    * An explicit `_row` preserves file order for first-match semantics
    * (Go slices are ordered; DataFrames need the column). */
  def readTypeCsv(spark: SparkSession, path: String, eventType: String): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    val have = df.columns.toSet
    val cols = Model.rawFieldNames.filter(_ != "EventType").map { f =>
      if (have.contains(f)) trim(coalesce(col(f), lit(""))).as(f)
      else lit("").as(f)
    }
    df.withColumn("_file_row", monotonically_increasing_id())
      .select(cols :+ lit(eventType).as("EventType") :+ col("_file_row"): _*)
  }

  /** Full genmock pipeline: returns (raw union, enriched) with `_row`
    * giving a total order (file order within type, types in fileDefs
    * order). */
  def build(spark: SparkSession, csvDir: String): (DataFrame, DataFrame) = {
    val perType = fileDefs.zipWithIndex.map { case ((stem, t, _), i) =>
      readTypeCsv(spark, s"$csvDir/$stem.csv", t)
        .withColumn("_type_idx", lit(i))
    }
    val raw = perType.reduce(_ unionByName _)
      .withColumn("_row",
        row_number().over(Window.orderBy(col("_type_idx"), col("_file_row"))))
      .drop("_type_idx", "_file_row")
    // genmock stamps RawEvent.Timestamp = 2024-04-26 and freezes the clock
    // at 2024-04-27 06:00 UTC (main.go:29,61-64).
    val enriched = Enrich.enrich(
      raw.withColumn("kafka_timestamp", to_timestamp(lit("2024-04-26 00:00:00"))),
      processedAt = to_timestamp(lit("2024-04-27 06:00:00")),
      keep = Seq("_row"))
    (raw, enriched)
  }

  /** Hard cap on JSON array fixture size — [[writeJsonArray]] collects to
    * the driver and sorts through one unpartitioned window, which is the
    * fixture-scale contract (mirrors the reference CLI); the cap makes
    * that contract ENFORCED rather than documented. Production sinks are
    * the parquet/Kafka writers. */
  val FixtureMaxRows = 100000L

  /** S7: pretty-printed JSON array fixture (fixtures are small — the
    * reference writes them with MarshalIndent; order follows `orderCol`).
    * Timestamps render RFC 3339 without fractional seconds, matching the
    * reference's Go time.Time marshalling. */
  def writeJsonArray(df: DataFrame, orderCol: String, path: String,
                     dropOrderCol: Boolean = false): Unit = {
    // limit(cap+1) stops the scan at the first over-cap row instead of
    // recomputing the full input lineage just to count it
    val over = df.limit(FixtureMaxRows.toInt + 1).count() > FixtureMaxRows
    require(!over,
      s"writeJsonArray is a driver-side fixture sink (input exceeds cap " +
        s"$FixtureMaxRows rows); write parquet for datasets at scale")
    val outCols = if (dropOrderCol) df.columns.filter(_ != orderCol)
      else df.columns
    // secondary sort on every column makes tie order deterministic across
    // generations (first-wins dedup downstream depends on fixture order)
    val orderCols = (orderCol +: df.columns.filterNot(_ == orderCol).toSeq)
      .map(col)
    val json = df.orderBy(orderCols: _*)
      .select(to_json(struct(outCols.map(col).toSeq: _*),
        Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ssXXX")).as("j"))
    val rows = json.collect().map(_.getString(0))
    val body = rows.mkString("[\n  ", ",\n  ", "\n]\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }

  /** S6: JSON array file source. */
  def readJsonArray(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(path)

  /** The stats report of `printStats` (`cmd/genmock/main.go:204-354`),
    * as one row of scalars plus grouped DataFrames. */
  final case class Stats(
      byType: Map[String, Long],
      bySeverity: Map[String, Long],
      withSeverity: Long,
      mag175plus: Long,
      maxHailMagnitude: Double,
      top5States: Seq[(String, Long)],
      tarrantCount: Long,
      severeHailTx: Long,
      hailPlusTornado: Long,
      nearFortWorth: Long,
      firstHailId: String)

  def stats(enriched: DataFrame): Stats = {
    import enriched.sparkSession.implicits._
    val e = enriched.cache()
    val byType = e.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val bySev = e.filter(col("severity").isNotNull)
      .groupBy("severity").count().as[(String, Long)].collect().toMap
    // A2: conditional counts
    val Row2 = e.agg(
      count(when(col("severity").isNotNull, 1)).as("with_sev"),
      count(when(col("magnitude") >= 1.75, 1)).as("m175"),
      max(when(col("event_type") === "hail", col("magnitude"))).as("max_hail"))
      .head()
    // O1/O2: top-5 states by count desc (ties by state asc for determinism)
    val top5 = e.groupBy("state").count()
      .orderBy(desc("count"), asc("state")).limit(5)
      .as[(String, Long)].collect().toSeq
    // F3/F4: filter combos + geo bounding box (main.go:283-322)
    val combos = e.agg(
      count(when(col("county") === "Tarrant", 1)).as("tarrant"),
      count(when(col("event_type") === "hail" && col("state") === "TX" &&
        col("severity") === "severe", 1)).as("severe_hail_tx"),
      count(when(col("event_type") === "hail" ||
        col("event_type") === "tornado", 1)).as("hail_tornado"),
      count(when(abs(col("lat") - 32.75) <= 0.75 &&
        abs(col("lon") + 97.15) <= 0.75, 1)).as("near_fw"))
      .head()
    // A5: first hail record in input order
    val firstHail = e.filter(col("event_type") === "hail")
      .orderBy("_row").limit(1).select("id").as[String].collect()
      .headOption.getOrElse("")
    e.unpersist()
    Stats(byType, bySev, Row2.getAs[Long]("with_sev"), Row2.getAs[Long]("m175"),
      Row2.getAs[Double]("max_hail"), top5,
      combos.getAs[Long]("tarrant"), combos.getAs[Long]("severe_hail_tx"),
      combos.getAs[Long]("hail_tornado"), combos.getAs[Long]("near_fw"),
      firstHail)
  }
}
