package graft.storm

import graft.streaming.{Metrics, MetricsListener, OpsServer, StormStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deployable entry points mirroring the reference's three binaries
  * (`cmd/etl`, `cmd/genmock`, `cmd/validate`). The ETL main needs the
  * spark-sql-kafka connector on the classpath at deploy time.
  */
object StormEtlMain {
  def main(args: Array[String]): Unit = {
    val cfg = StormStream.Config.fromEnv()
    val spark = SparkSession.builder()
      .appName("storm-etl")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val metrics = new Metrics
    spark.streams.addListener(new MetricsListener(metrics, Some("storm-etl")))
    val ops = new OpsServer(metrics, cfg.httpAddr)
    ops.start()
    val query = StormStream.start(spark, cfg, Some(metrics))
    StormStream.installShutdownHook(query, Some(ops))
    query.awaitTermination()
  }
}

/** CSV dir → fixtures + stats report (args: csvDir outDir). */
object GenMockMain {
  def main(args: Array[String]): Unit = {
    val Array(csvDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("storm-genmock")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val (raw, enriched) = GenMock.build(spark, csvDir)
    // order by the preserved file order, not a non-unique sort key
    GenMock.writeJsonArray(raw, "_row", s"$outDir/etl_fixture.json",
      dropOrderCol = true)
    GenMock.writeJsonArray(Enrich.nested(enriched.drop("_row")), "id",
      s"$outDir/api_fixture.json")
    val s = GenMock.stats(enriched)
    println(s"By type: ${s.byType}")
    println(s"By severity: ${s.bySeverity}")
    println(s"With severity: ${s.withSeverity}  magnitude>=1.75: ${s.mag175plus}")
    println(s"Max hail magnitude: ${s.maxHailMagnitude}")
    println(s"Top 5 states: ${s.top5States}")
    println(s"Tarrant County: ${s.tarrantCount}")
    println(s"Severe hail in TX: ${s.severeHailTx}")
    println(s"Hail + Tornado: ${s.hailPlusTornado}")
    println(s"Near Fort Worth: ${s.nearFortWorth}")
    println(s"First hail record: ${s.firstHailId}")
    spark.stop()
  }
}

/** Cross-source integrity suite (args: csvDir etlFixture.json
  * apiFixture.json — the reference validates independently produced
  * artifacts against each other, `cmd/validate/main.go:82-108`; comparing a
  * dataset with itself would be a tautology). Exit code 1 on violations. */
object ValidateMain {
  def main(args: Array[String]): Unit = {
    val Array(csvDir, etlJson, apiJson) = args.take(3)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("storm-validate")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // independent inputs: raw re-read from the source CSVs vs the published
    // ETL fixture vs the published API (enriched) fixture
    val (raw, _) = GenMock.build(spark, csvDir)
    val etl = GenMock.readJsonArray(spark, etlJson, Model.rawSchema)
    val api = GenMock.readJsonArray(spark, apiJson, Model.stormSchema)
    // flatten the published nested API records back to the flat compare shape
    val apiFlat = api.select(
      col("id"), col("event_type"),
      col("geo.lat").as("lat"), col("geo.lon").as("lon"),
      col("measurement.magnitude").as("magnitude"),
      col("measurement.unit").as("unit"),
      col("measurement.severity").as("severity"),
      to_timestamp(col("event_time")).as("event_time"),
      col("location.name").as("location_name"),
      col("location.distance").as("location_distance"),
      col("location.direction").as("location_direction"),
      col("location.state").as("state"), col("location.county").as("county"),
      col("source_office"),
      to_timestamp(col("time_bucket")).as("time_bucket"),
      monotonically_increasing_id().as("_row"))
    val rawNoRow = raw.drop("_row")
    val phases: Seq[(String, Long)] = Seq(
      // order by EVERY raw column: full-row duplicates then pair
      // harmlessly regardless of tie order (a partial key would let tied
      // rows cross-pair and flag spurious mismatches)
      "phase1 row parity" ->
        StormValidate.rowParity(rawNoRow, etl, Model.rawFieldNames).count(),
      "phase2 count mismatches" ->
        StormValidate.countMismatches(raw, etl).count(),
      "phase2 anti-join misses" ->
        StormValidate.missingFromEtl(raw, etl).count(),
      "phase2 column exclusivity" ->
        StormValidate.columnExclusivity(etl).count(),
      "phase3 transform diffs" ->
        StormValidate.apiTransformCheck(raw, apiFlat).count(),
      "phase4 schema alignment" ->
        StormValidate.schemaAlignment(apiFlat).count())
    phases.foreach { case (name, n) =>
      println(f"$name%-28s ${if (n == 0) "PASS" else s"FAIL ($n violations)"}")
    }
    spark.stop()
    if (phases.exists(_._2 > 0)) sys.exit(1)
  }
}
