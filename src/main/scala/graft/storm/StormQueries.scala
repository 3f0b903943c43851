package graft.storm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate exposure of the storm enrichment chain (SURVEY.md §2.2,
  * P1–P15): the `events` table is deterministically projected into raw
  * storm-report records — mixing valid/invalid event types, all three time
  * formats, UNK/EF-prefixed magnitudes, parseable and plain locations, and
  * office codes — then run through [[Enrich.enrich]]. The DuckDB oracle
  * reconstructs the identical projection and re-implements every rule in
  * SQL, so the whole chain (including sha256 IDs with `%g` formatting) is
  * value-checked cross-engine (reference: `internal/domain/transform.go`).
  */
object StormQueries {

  /** Deterministic raw-record projection of `events` (shared contract with
    * [[rawSql]] below — keep in lockstep). */
  def syntheticRaw(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "events")
    val m5 = col("event_id") % 5
    val kts = date_trunc("second", col("ts"))
    e.select(
      col("event_id"),
      kts.as("kafka_timestamp"),
      when(col("event_type") === "click", "hail")
        .when(col("event_type") === "view", "wind")
        .when(col("event_type") === "error", "tornado")
        .when(col("event_type") === "purchase", "HAIL") // case variant → invalid
        .otherwise("gusty") // unknown type
        .as("EventType"),
      when(m5 === 0, "")
        .when(m5 === 1, date_format(kts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .when(m5 === 2, format_string("%02d%02d", hour(col("ts")), minute(col("ts"))))
        .when(m5 === 3, "973") // 3-digit HHMM, zero-padded
        .otherwise("2567") // invalid hour → fallback to kafka ts
        .as("Time"),
      when(col("event_type") === "click", GoFormat.go_fmt_f(col("value"), 2))
        .otherwise("").as("Size"),
      when(col("event_type") === "error",
        when(col("event_id") % 7 === 0, lit("UNK"))
          .otherwise(concat(lit("EF"), (col("event_id") % 6).cast("string"))))
        .otherwise(lit("")).as("F_Scale"),
      when(col("event_type") === "view", GoFormat.go_fmt_f(col("value"), 2))
        .otherwise("").as("Speed"),
      when(col("event_id") % 4 === 0,
        concat((col("event_id") % 20).cast("string"), lit(" NNE Site")))
        .when(col("event_id") % 4 === 1, lit("Fort Worth"))
        .when(col("event_id") % 4 === 2, lit(""))
        .otherwise(lit("8.5 ESE Chappel Hill"))
        .as("Location"),
      concat(lit("County"), (col("event_id") % 50).cast("string")).as("County"),
      concat(lit("S"), (col("user_id") % 30).cast("string")).as("State"),
      when(m5 === 2, lit("")).otherwise(
        GoFormat.go_fmt_f((col("event_id") % 5000) / lit(100.0) + lit(25.0), 2))
        .as("Lat"),
      GoFormat.go_fmt_f(-(col("event_id") % 9000) / lit(100.0) - lit(70.0), 2)
        .as("Lon"),
      when(col("event_id") % 3 === 0, lit("Report filed. (OUN)"))
        .when(col("event_id") % 3 === 1, lit("no office here"))
        .otherwise(lit("spotter says (KTLX) "))
        .as("Comments"))
  }

  /** Shared oracle CTE producing the identical raw projection in DuckDB. */
  private val rawSql: String =
    """raw AS (
      |  SELECT event_id,
      |    date_trunc('second', ts) AS kts,
      |    CASE event_type WHEN 'click' THEN 'hail' WHEN 'view' THEN 'wind'
      |      WHEN 'error' THEN 'tornado' WHEN 'purchase' THEN 'HAIL'
      |      ELSE 'gusty' END AS rtype,
      |    CASE event_id % 5
      |      WHEN 0 THEN ''
      |      WHEN 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ')
      |      WHEN 2 THEN printf('%02d%02d', hour(ts), minute(ts))
      |      WHEN 3 THEN '973' ELSE '2567' END AS rtime,
      |    CASE WHEN event_type = 'click' THEN printf('%.2f', value) ELSE '' END AS size,
      |    CASE WHEN event_type = 'error' THEN
      |      (CASE WHEN event_id % 7 = 0 THEN 'UNK'
      |            ELSE 'EF' || (event_id % 6)::VARCHAR END)
      |      ELSE '' END AS f_scale,
      |    CASE WHEN event_type = 'view' THEN printf('%.2f', value) ELSE '' END AS speed,
      |    CASE event_id % 4
      |      WHEN 0 THEN (event_id % 20)::VARCHAR || ' NNE Site'
      |      WHEN 1 THEN 'Fort Worth'
      |      WHEN 2 THEN ''
      |      ELSE '8.5 ESE Chappel Hill' END AS loc,
      |    'County' || (event_id % 50)::VARCHAR AS county,
      |    'S' || (user_id % 30)::VARCHAR AS state,
      |    CASE WHEN event_id % 5 = 2 THEN ''
      |         ELSE printf('%.2f', (event_id % 5000) / 100.0 + 25.0) END AS lat_s,
      |    printf('%.2f', -(event_id % 9000) / 100.0 - 70.0) AS lon_s,
      |    CASE event_id % 3
      |      WHEN 0 THEN 'Report filed. (OUN)'
      |      WHEN 1 THEN 'no office here'
      |      ELSE 'spotter says (KTLX) ' END AS comments
      |  FROM events)""".stripMargin

  /** Oracle CTE chain re-implementing parse + enrichment rules in SQL over
    * any `raw` CTE exposing (kts, rtype, rtime, size, f_scale, speed, loc,
    * county, state, lat_s, lon_s, comments) — shared by the synthetic
    * projection and the reference-fixture oracle.
    *
    * Domain note on ID parity: the id hash embeds DuckDB `printf('%g')`,
    * which is C-style %g (6 significant digits). It agrees with Go's
    * shortest-round-trip %g (GoFormat.formatG) only while magnitudes carry
    * <= 6 significant digits — true for every NOAA value and this synthetic
    * projection (%.2f-rendered), asserted directly by GoFormatSpec beyond
    * that range. */
  private def chainSql(rawCte: String): String =
    s"""WITH $rawCte,
      |parsed AS (
      |  SELECT *,
      |    coalesce(TRY_CAST(trim(lat_s) AS DOUBLE), 0.0) AS lat,
      |    coalesce(TRY_CAST(trim(lon_s) AS DOUBLE), 0.0) AS lon,
      |    CASE rtype WHEN 'hail' THEN trim(size) WHEN 'tornado' THEN trim(f_scale)
      |      WHEN 'wind' THEN trim(speed) ELSE '' END AS mag_raw
      |  FROM raw),
      |magp AS (
      |  SELECT *,
      |    CASE WHEN mag_raw = '' OR upper(mag_raw) = 'UNK' THEN 0.0
      |      ELSE coalesce(TRY_CAST(
      |        regexp_replace(regexp_replace(mag_raw, '^EF', ''), '^F', '')
      |        AS DOUBLE), 0.0) END AS mag_parsed
      |  FROM parsed),
      |timed AS (
      |  SELECT *,
      |    CASE WHEN trim(rtime) = '' THEN kts
      |      WHEN TRY_CAST(trim(rtime) AS TIMESTAMP) IS NOT NULL
      |        THEN TRY_CAST(trim(rtime) AS TIMESTAMP)
      |      ELSE (
      |        CASE WHEN length(trim(rtime)) >= 3
      |          AND regexp_full_match(substr(CASE WHEN length(trim(rtime)) = 3
      |                THEN '0' || trim(rtime) ELSE trim(rtime) END, 1, 2),
      |              '[+-]?[0-9]+')
      |          AND regexp_full_match(substr(CASE WHEN length(trim(rtime)) = 3
      |                THEN '0' || trim(rtime) ELSE trim(rtime) END, 3),
      |              '[+-]?[0-9]+')
      |          AND TRY_CAST(substr(CASE WHEN length(trim(rtime)) = 3
      |                THEN '0' || trim(rtime) ELSE trim(rtime) END, 1, 2) AS INT)
      |              BETWEEN 0 AND 23
      |          AND TRY_CAST(substr(CASE WHEN length(trim(rtime)) = 3
      |                THEN '0' || trim(rtime) ELSE trim(rtime) END, 3) AS INT)
      |              BETWEEN 0 AND 59
      |        THEN make_timestamp(year(kts), month(kts), day(kts),
      |               TRY_CAST(substr(CASE WHEN length(trim(rtime)) = 3
      |                 THEN '0' || trim(rtime) ELSE trim(rtime) END, 1, 2) AS INT),
      |               TRY_CAST(substr(CASE WHEN length(trim(rtime)) = 3
      |                 THEN '0' || trim(rtime) ELSE trim(rtime) END, 3) AS INT), 0)
      |        ELSE kts END)
      |      END AS event_time
      |  FROM magp),
      |enr AS (
      |  SELECT *,
      |    CASE WHEN rtype IN ('hail','wind','tornado') THEN rtype ELSE '' END AS etype,
      |    CASE WHEN rtype = '' THEN
      |        substr(sha256(rtype || '|' || state || '|' || printf('%.4f', lat)
      |          || '|' || printf('%.4f', lon) || '|' || rtime || '|'
      |          || printf('%g', mag_parsed)), 1, 16)
      |      ELSE rtype || '-' ||
      |        substr(sha256(rtype || '|' || state || '|' || printf('%.4f', lat)
      |          || '|' || printf('%.4f', lon) || '|' || rtime || '|'
      |          || printf('%g', mag_parsed)), 1, 16) END AS id
      |  FROM timed),
      |unitd AS (
      |  SELECT *,
      |    CASE etype WHEN 'hail' THEN 'in' WHEN 'wind' THEN 'mph'
      |      WHEN 'tornado' THEN 'f_scale' ELSE '' END AS unit
      |  FROM enr),
      |normd AS (
      |  SELECT *,
      |    CASE WHEN mag_parsed = 0 THEN mag_parsed
      |      WHEN etype = 'hail' AND unit = 'in' AND mag_parsed >= 10
      |        THEN mag_parsed / 100.0
      |      ELSE mag_parsed END AS magnitude
      |  FROM unitd),
      |sev AS (
      |  SELECT *,
      |    CASE WHEN magnitude = 0 THEN NULL
      |      WHEN etype = 'hail' THEN
      |        (CASE WHEN magnitude < 0.75 THEN 'minor'
      |              WHEN magnitude < 1.5 THEN 'moderate'
      |              WHEN magnitude < 2.5 THEN 'severe' ELSE 'extreme' END)
      |      WHEN etype = 'wind' THEN
      |        (CASE WHEN magnitude < 50 THEN 'minor'
      |              WHEN magnitude < 74 THEN 'moderate'
      |              WHEN magnitude < 96 THEN 'severe' ELSE 'extreme' END)
      |      WHEN etype = 'tornado' THEN
      |        (CASE WHEN magnitude <= 1 THEN 'minor'
      |              WHEN magnitude = 2 THEN 'moderate'
      |              WHEN magnitude <= 4 THEN 'severe' ELSE 'extreme' END)
      |      ELSE NULL END AS severity,
      |    regexp_extract(trim(comments), '\\(([A-Z]{3,5})\\)\\s*$$', 1) AS source_office,
      |    CASE WHEN regexp_full_match(trim(loc),
      |           '(\\d+(?:\\.\\d+)?)\\s+([NSEW]{1,3})\\s+(.+)')
      |      THEN trim(regexp_extract(trim(loc),
      |           '^(\\d+(?:\\.\\d+)?)\\s+([NSEW]{1,3})\\s+(.+)$$', 3))
      |      ELSE trim(loc) END AS location_name,
      |    CASE WHEN regexp_full_match(trim(loc),
      |           '(\\d+(?:\\.\\d+)?)\\s+([NSEW]{1,3})\\s+(.+)')
      |      THEN TRY_CAST(regexp_extract(trim(loc),
      |           '^(\\d+(?:\\.\\d+)?)\\s+([NSEW]{1,3})\\s+(.+)$$', 1) AS DOUBLE)
      |      ELSE NULL END AS location_distance,
      |    CASE WHEN regexp_full_match(trim(loc),
      |           '(\\d+(?:\\.\\d+)?)\\s+([NSEW]{1,3})\\s+(.+)')
      |      THEN regexp_extract(trim(loc),
      |           '^(\\d+(?:\\.\\d+)?)\\s+([NSEW]{1,3})\\s+(.+)$$', 2)
      |      ELSE NULL END AS location_direction
      |  FROM normd)""".stripMargin

  private val enrichedSql: String = chainSql(rawSql)

  /** Raw CTE over the reference's 271-record golden fixture, read directly
    * by DuckDB — upgrades the fixture from ScalaTest-only goldens to a
    * hash-checked gate row. */
  val FixturePath = "/root/reference/data/mock/storm_reports_240426_combined.json"

  private val fixtureRawSql: String =
    s"""raw AS (
      |  SELECT TIMESTAMP '2024-04-26 00:00:00' AS kts,
      |    EventType AS rtype, Time AS rtime, Size AS size,
      |    F_Scale AS f_scale, Speed AS speed, Location AS loc,
      |    County AS county, State AS state, Lat AS lat_s, Lon AS lon_s,
      |    Comments AS comments
      |  FROM read_json('$FixturePath', format='array', columns={
      |    'Time': 'VARCHAR', 'Size': 'VARCHAR', 'F_Scale': 'VARCHAR',
      |    'Speed': 'VARCHAR', 'Location': 'VARCHAR', 'County': 'VARCHAR',
      |    'State': 'VARCHAR', 'Lat': 'VARCHAR', 'Lon': 'VARCHAR',
      |    'Comments': 'VARCHAR', 'EventType': 'VARCHAR'}))""".stripMargin

  /** Full-row enrichment, keyed by event_id (timestamps as strings). */
  def stormEnrich(s: SparkSession, dir: String): DataFrame = {
    val enriched = Enrich.enrich(syntheticRaw(s, dir),
      processedAt = to_timestamp(lit("2024-02-01 00:00:00")), keep = Seq("event_id"))
    enriched.select(
      col("event_id"), col("id"), col("event_type"), col("magnitude"),
      col("unit"), col("severity"),
      date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
      date_format(col("time_bucket"), "yyyy-MM-dd HH:mm:ss").as("time_bucket"),
      col("location_name"), col("location_distance"), col("location_direction"),
      col("source_office"), col("state"), col("county"))
  }

  /** Aggregate view: counts + mean magnitude per (type, severity). */
  def stormSeverityCounts(s: SparkSession, dir: String): DataFrame =
    Enrich.enrich(syntheticRaw(s, dir),
      processedAt = to_timestamp(lit("2024-02-01 00:00:00")))
      .groupBy("event_type", "severity", "unit")
      .agg(count(lit(1)).as("n"),
        round(avg("magnitude"), 4).as("avg_magnitude"))

  /** Hourly time-bucket roll-up of enriched events (P13 at scale). */
  def stormBucketCounts(s: SparkSession, dir: String): DataFrame =
    Enrich.enrich(syntheticRaw(s, dir),
      processedAt = to_timestamp(lit("2024-02-01 00:00:00")))
      .groupBy(date_format(col("time_bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(count(lit(1)).as("n_reports"),
        countDistinct("id").as("n_distinct_ids"))

  /** Golden-fixture enrichment (reference data), emitted as the FLAT scalar
    * projection so the gate's comparator can hash it — the DuckDB oracle
    * reads the same fixture file via read_json and re-runs the rule chain.
    * (The nested wire shape stays covered by ScalaTest goldens +
    * FixtureDemo.) */
  def stormFixture(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.option("multiLine", true).schema(Model.rawSchema)
      .json(FixturePath)
      .withColumn("kafka_timestamp", to_timestamp(lit("2024-04-26 00:00:00")))
    Enrich.enrich(raw, processedAt = to_timestamp(lit("2024-04-27 06:00:00")))
      .select(
        col("id"), col("event_type"), col("lat"), col("lon"),
        col("magnitude"), col("unit"), col("severity"),
        date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
        col("location_raw"), col("location_name"), col("location_distance"),
        col("location_direction"), col("state"), col("county"),
        col("comments"), col("source_office"),
        date_format(col("time_bucket"), "yyyy-MM-dd HH:mm:ss").as("time_bucket"),
        date_format(col("processed_at"), "yyyy-MM-dd HH:mm:ss").as("processed_at"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "storm_enrich" -> stormEnrich,
    "storm_severity_counts" -> stormSeverityCounts,
    "storm_bucket_counts" -> stormBucketCounts,
    "storm_fixture" -> stormFixture)

  val oracles: Map[String, String] = Map(
    "storm_enrich" ->
      (enrichedSql + "\n" + """SELECT event_id, id, etype AS event_type, magnitude, unit, severity,
        |  strftime(event_time, '%Y-%m-%d %H:%M:%S') AS event_time,
        |  strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S') AS time_bucket,
        |  location_name, location_distance, location_direction,
        |  source_office, state, county
        |FROM sev""".stripMargin),
    "storm_severity_counts" ->
      (enrichedSql + "\n" + """SELECT etype AS event_type, severity, unit, count(*) AS n,
        |  round(avg(magnitude), 4) AS avg_magnitude
        |FROM sev GROUP BY 1, 2, 3""".stripMargin),
    "storm_bucket_counts" ->
      (enrichedSql + "\n" + """SELECT strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS n_reports, count(DISTINCT id) AS n_distinct_ids
        |FROM sev GROUP BY 1""".stripMargin),
    "storm_fixture" ->
      (chainSql(fixtureRawSql) + "\n" +
        """SELECT id, etype AS event_type, lat, lon, magnitude, unit, severity,
          |  strftime(event_time, '%Y-%m-%d %H:%M:%S') AS event_time,
          |  loc AS location_raw, location_name, location_distance,
          |  location_direction, state, county, comments, source_office,
          |  strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S')
          |    AS time_bucket,
          |  '2024-04-27 06:00:00' AS processed_at
          |FROM sev""".stripMargin))
}
