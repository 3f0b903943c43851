package graft.storm

import graft.streaming.{Metrics, MetricsListener, OpsServer, StormStream}
import org.apache.spark.sql.SparkSession

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
    val query = StormStream.start(spark, cfg)
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
    spark.stop()
  }
}

/** Cross-source integrity suite (args: csvDir). Exit code 1 on violations,
  * mirroring the reference's pass/fail report. */
object ValidateMain {
  def main(args: Array[String]): Unit = {
    val Array(csvDir) = args.take(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("storm-validate")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (raw, enriched) = GenMock.build(spark, csvDir)
    val phases: Seq[(String, Long)] = Seq(
      "phase1 row parity" ->
        StormValidate.rowParity(raw, raw, Seq("_row")).count(),
      "phase2 count mismatches" ->
        StormValidate.countMismatches(raw, raw).count(),
      "phase2 anti-join misses" ->
        StormValidate.missingFromEtl(raw, raw).count(),
      "phase2 column exclusivity" ->
        StormValidate.columnExclusivity(raw).count(),
      "phase3 transform diffs" ->
        StormValidate.apiTransformCheck(raw, enriched).count(),
      "phase4 schema alignment" ->
        StormValidate.schemaAlignment(enriched).count())
    phases.foreach { case (name, n) =>
      println(f"$name%-28s ${if (n == 0) "PASS" else s"FAIL ($n violations)"}")
    }
    spark.stop()
    if (phases.exists(_._2 > 0)) sys.exit(1)
  }
}
