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

  /** Shared oracle CTE producing the identical raw projection in DuckDB.
    * `ktsExpr` is the kafka-timestamp expression — the synthetic gates
    * use the event's own (second-truncated) ts; the api-check gate
    * overrides it with the checker's constant, exactly like
    * [[StormValidate.apiTransformCheck]] does on the Spark side. */
  private def rawSqlWithKts(ktsExpr: String): String =
    s"""raw AS (
      |  SELECT event_id,
      |    $ktsExpr AS kts,
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

  private val rawSql: String = rawSqlWithKts("date_trunc('second', ts)")

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

  /** Gate for [[StormValidate.rowParity]] (J5) — the positional
    * row-parity validator run against a PLANTED divergence: side `b` is
    * the enriched projection with every 97th event's magnitude bumped,
    * so the violations relation is exactly those rows, cross-checked by
    * a DuckDB `row_number` zip over the same total order. The gate
    * upgrades J5 from spec-only to hash-checked: the range-partitioned
    * zipWithIndex must assign exactly the ranks a global ORDER BY
    * event_id assigns, or the join keys (and the hash) diverge. */
  def stormRowParity(s: SparkSession, dir: String): DataFrame = {
    // materialize the enriched projection once — side b derives from it,
    // so the enrichment chain runs ONE time instead of once per side
    val a = stormEnrich(s, dir)
      .select(col("event_id"), col("id"), col("magnitude"))
      .localCheckpoint(true)
    val b = a.withColumn("magnitude",
      when(col("event_id") % 97 === 0, col("magnitude") + 1)
        .otherwise(col("magnitude")))
    StormValidate.rowParity(a, b, Seq("event_id"))
  }

  /** Gate for [[StormValidate.apiTransformCheck]] (J3+J4) — the
    * tolerant API cross-check run against a PLANTED api set: the
    * expected relation's own rows with (a) every 17th event missing
    * (→ `missing_in_api`), (b) every 13th magnitude off by 0.5 and
    * every 19th severity forced (→ field violations), and (c) every
    * 11th event duplicated with a corrupted state under a LATER `_row`
    * (→ silently dropped by the first-wins dedup — the ON CONFLICT DO
    * NOTHING mirror). `_row` is 2·event_id for originals and
    * 2·event_id+1 for duplicates so first-wins is total even across
    * hash-colliding ids. The oracle replays the entire construction —
    * enrichment chain, corruption, dedup, per-field tolerant compare —
    * in SQL. */
  def stormApiCheck(s: SparkSession, dir: String): DataFrame = {
    val raw = syntheticRaw(s, dir)
    // the checker re-derives `expected` internally from this same raw
    // relation (with its own constant kafka_timestamp); the planted api
    // set must corrupt THAT relation, so build it identically here
    val expected = Enrich.enrich(
      raw.withColumn("kafka_timestamp",
        to_timestamp(lit("2024-04-26 00:00:00"))),
      processedAt = to_timestamp(lit("2024-04-27 06:00:00")),
      keep = Seq("event_id"))
      // read by BOTH union branches of the planted-api construction —
      // materialize once so the enrichment chain runs once, not twice
      .localCheckpoint(true)
    val api = expected
      .filter(col("event_id") % 17 =!= 0)
      .withColumn("magnitude",
        when(col("event_id") % 13 === 0, col("magnitude") + 0.5)
          .otherwise(col("magnitude")))
      .withColumn("severity",
        when(col("event_id") % 19 === 0, lit("extreme"))
          .otherwise(col("severity")))
      .withColumn("_row", col("event_id") * 2)
      .unionByName(expected.filter(col("event_id") % 11 === 0)
        .withColumn("state", lit("XX"))
        .withColumn("_row", col("event_id") * 2 + 1))
      .drop("event_id")
    // the checker would re-derive `expected` from raw via the identical
    // chain+constants — hand it the one we already materialized instead
    // (minus the construction-only event_id), so the enrichment chain
    // runs ONCE per gate call, not twice (guide §5: don't compute twice)
    StormValidate.apiTransformCheckOver(expected.drop("event_id"), api)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "storm_enrich" -> stormEnrich,
    "storm_severity_counts" -> stormSeverityCounts,
    "storm_bucket_counts" -> stormBucketCounts,
    "storm_fixture" -> stormFixture,
    "storm_row_parity" -> stormRowParity,
    "storm_api_check" -> stormApiCheck)

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
          |FROM sev""".stripMargin),
    "storm_row_parity" ->
      (enrichedSql + ",\n" +
        """pa AS (SELECT event_id, id, magnitude FROM sev),
          |pb AS (SELECT event_id, id,
          |         CASE WHEN event_id % 97 = 0 THEN magnitude + 1
          |              ELSE magnitude END AS magnitude FROM sev),
          |ai AS (SELECT *, row_number() OVER (ORDER BY event_id) AS _rn
          |       FROM pa),
          |bi AS (SELECT *, row_number() OVER (ORDER BY event_id) AS _rn
          |       FROM pb)
          |SELECT coalesce(a._rn, b._rn) AS "row",
          |  a.event_id AS a_event_id, b.event_id AS b_event_id,
          |  a.id AS a_id, b.id AS b_id,
          |  a.magnitude AS a_magnitude, b.magnitude AS b_magnitude
          |FROM ai a FULL OUTER JOIN bi b ON a._rn = b._rn
          |WHERE a._rn IS NULL OR b._rn IS NULL
          |   OR a.event_id IS DISTINCT FROM b.event_id
          |   OR a.id IS DISTINCT FROM b.id
          |   OR a.magnitude IS DISTINCT FROM b.magnitude""".stripMargin),
    "storm_api_check" ->
      (chainSql(rawSqlWithKts("TIMESTAMP '2024-04-26 00:00:00'")) + ",\n" +
        """expd AS (SELECT event_id, id, etype AS event_type, lat, lon,
          |    magnitude, unit, severity, event_time, location_name,
          |    location_distance, location_direction, state, county,
          |    source_office, date_trunc('hour', event_time) AS time_bucket
          |  FROM sev),
          |apirows AS (
          |  SELECT * REPLACE (
          |      CASE WHEN event_id % 13 = 0 THEN magnitude + 0.5
          |           ELSE magnitude END AS magnitude,
          |      CASE WHEN event_id % 19 = 0 THEN 'extreme'
          |           ELSE severity END AS severity),
          |    event_id * 2 AS _row
          |  FROM expd WHERE event_id % 17 <> 0
          |  UNION ALL
          |  SELECT * REPLACE ('XX' AS state), event_id * 2 + 1 AS _row
          |  FROM expd WHERE event_id % 11 = 0),
          |apidedup AS (SELECT * FROM (
          |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY _row)
          |      AS rn
          |    FROM apirows) WHERE rn = 1),
          |joined AS (SELECT e.id,
          |    e.event_type AS e_event_type, a.event_type AS a_event_type,
          |    e.lat AS e_lat, a.lat AS a_lat,
          |    e.lon AS e_lon, a.lon AS a_lon,
          |    e.magnitude AS e_magnitude, a.magnitude AS a_magnitude,
          |    e.unit AS e_unit, a.unit AS a_unit,
          |    e.severity AS e_severity, a.severity AS a_severity,
          |    e.event_time AS e_event_time, a.event_time AS a_event_time,
          |    e.location_name AS e_ln, a.location_name AS a_ln,
          |    e.location_distance AS e_ld, a.location_distance AS a_ld,
          |    e.location_direction AS e_ldir, a.location_direction AS a_ldir,
          |    e.state AS e_state, a.state AS a_state,
          |    e.county AS e_county, a.county AS a_county,
          |    e.source_office AS e_so, a.source_office AS a_so,
          |    e.time_bucket AS e_tb, a.time_bucket AS a_tb
          |  FROM expd e JOIN apidedup a ON a.id = e.id)
          |SELECT id, field FROM (
          |  SELECT id, 'event_type' AS field FROM joined
          |    WHERE e_event_type IS DISTINCT FROM a_event_type
          |  UNION ALL SELECT id, 'lat' FROM joined
          |    WHERE NOT coalesce(abs(e_lat - a_lat) < 1e-9
          |      OR (e_lat IS NULL AND a_lat IS NULL), FALSE)
          |  UNION ALL SELECT id, 'lon' FROM joined
          |    WHERE NOT coalesce(abs(e_lon - a_lon) < 1e-9
          |      OR (e_lon IS NULL AND a_lon IS NULL), FALSE)
          |  UNION ALL SELECT id, 'magnitude' FROM joined
          |    WHERE NOT coalesce(abs(e_magnitude - a_magnitude) < 1e-9
          |      OR (e_magnitude IS NULL AND a_magnitude IS NULL), FALSE)
          |  UNION ALL SELECT id, 'unit' FROM joined
          |    WHERE e_unit IS DISTINCT FROM a_unit
          |  UNION ALL SELECT id, 'severity' FROM joined
          |    WHERE e_severity IS DISTINCT FROM a_severity
          |  UNION ALL SELECT id, 'event_time' FROM joined
          |    WHERE e_event_time IS DISTINCT FROM a_event_time
          |  UNION ALL SELECT id, 'location_name' FROM joined
          |    WHERE e_ln IS DISTINCT FROM a_ln
          |  UNION ALL SELECT id, 'location_distance' FROM joined
          |    WHERE NOT coalesce(abs(e_ld - a_ld) < 1e-9
          |      OR (e_ld IS NULL AND a_ld IS NULL)
          |      OR e_ld IS NOT DISTINCT FROM a_ld, FALSE)
          |  UNION ALL SELECT id, 'location_direction' FROM joined
          |    WHERE e_ldir IS DISTINCT FROM a_ldir
          |  UNION ALL SELECT id, 'state' FROM joined
          |    WHERE e_state IS DISTINCT FROM a_state
          |  UNION ALL SELECT id, 'county' FROM joined
          |    WHERE e_county IS DISTINCT FROM a_county
          |  UNION ALL SELECT id, 'source_office' FROM joined
          |    WHERE e_so IS DISTINCT FROM a_so
          |  UNION ALL SELECT id, 'time_bucket' FROM joined
          |    WHERE e_tb IS DISTINCT FROM a_tb
          |  UNION ALL SELECT e.id, 'missing_in_api' FROM expd e
          |    WHERE NOT EXISTS (SELECT 1 FROM apidedup a
          |                      WHERE a.id = e.id))""".stripMargin))
}
