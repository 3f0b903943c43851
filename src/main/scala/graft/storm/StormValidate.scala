package graft.storm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source data-integrity suite — the Spark re-expression of the
  * reference's `cmd/validate` four phases (SURVEY.md §3.3). Every check
  * returns a violations DataFrame; a phase passes when its count is 0.
  * These are the engine's constraint-check operators (J2–J6, F5).
  */
object StormValidate {

  /** Phase 1 (J5): positional row parity — row i of `a` must equal row i of
    * `b` on every shared column. Order is made explicit with `orderCols`
    * (Go compared slices positionally; DataFrames need a total order).
    *
    * The global row index is range-partition + in-partition sort +
    * `zipWithIndex` — NOT an unpartitioned `Window.orderBy`, which funnels
    * every row through one task. RangePartitioner keeps partitions in key
    * order, so zipWithIndex's partition-ordered indices form the same total
    * order a global sort would, with the sort work spread across tasks. */
  def rowParity(a: DataFrame, b: DataFrame, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "rowParity needs a total order")
    def indexed(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      // Materialize the input once: RangePartitioner's sampling pass and
      // the range-shuffle map pass otherwise EACH re-run the upstream plan
      // (an enrichment chain here — measured 2 evaluations per side, 4 per
      // parity check). One checkpointed snapshot feeds both passes.
      val snap = df.localCheckpoint(true)
      val sorted = snap
        .repartitionByRange(orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*)
      val schema = org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+
          org.apache.spark.sql.types.StructField(
            "_rn", org.apache.spark.sql.types.LongType, nullable = false))
      val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      spark.createDataFrame(rdd, schema)
    }
    val an = indexed(a).as("a")
    val bn = indexed(b).as("b")
    val shared = a.columns.intersect(b.columns).toSeq
    val mismatch = shared.map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduce(_ || _)
    val outCols = coalesce(col("a._rn"), col("b._rn")).as("row") +:
      shared.flatMap(c => Seq(col(s"a.$c").as(s"a_$c"),
        col(s"b.$c").as(s"b_$c")))
    an.join(bn, col("a._rn") === col("b._rn"), "full_outer")
      .filter(col("a._rn").isNull || col("b._rn").isNull || mismatch)
      .select(outCols: _*)
  }

  /** Phase 2a (A4): per-type record counts must match the source. */
  def countMismatches(source: DataFrame, etl: DataFrame): DataFrame = {
    val s = source.groupBy("EventType").agg(count(lit(1)).as("expected"))
    val e = etl.groupBy("EventType").agg(count(lit(1)).as("actual"))
    s.join(e, Seq("EventType"), "full_outer")
      .filter(!(col("expected") <=> col("actual")))
  }

  /** Phase 2b (J2): every source row must hit the ETL index on the
    * composite key type|state|lat|lon|time — anti-join survivors are the
    * violations (`cmd/validate/main.go:298-313`). */
  def missingFromEtl(source: DataFrame, etl: DataFrame): DataFrame = {
    val key = Seq("EventType", "State", "Lat", "Lon", "Time")
    source.join(etl.select(key.map(col): _*).distinct(), key, "left_anti")
  }

  /** Phase 2c (J6): per-type magnitude-column exclusivity — hail rows must
    * carry only Size, tornadoes only F_Scale, wind only Speed
    * (`cmd/validate/main.go:316-347`). */
  def columnExclusivity(raw: DataFrame): DataFrame = {
    def filled(c: String): Column = trim(coalesce(col(c), lit(""))) =!= ""
    raw.filter(
      (col("EventType") === "hail" && (filled("F_Scale") || filled("Speed"))) ||
        (col("EventType") === "tornado" && (filled("Size") || filled("Speed"))) ||
        (col("EventType") === "wind" && (filled("Size") || filled("F_Scale"))))
  }

  /** Phase 3 (J3+J4): re-run the transform on the raw ETL records, dedup
    * the API set first-wins by id (mirroring ON CONFLICT DO NOTHING), join
    * by id and compare fields with 1e-9 float tolerance and null-safe
    * equality (`cmd/validate/main.go:352-462`). Violations carry the field
    * name and both values. */
  def apiTransformCheck(etlRaw: DataFrame, api: DataFrame,
                        orderCol: String = "_row"): DataFrame =
    apiTransformCheckOver(
      Enrich.enrich(
        etlRaw.withColumn("kafka_timestamp",
          to_timestamp(lit("2024-04-26 00:00:00"))),
        processedAt = to_timestamp(lit("2024-04-27 06:00:00")))
        .localCheckpoint(true),
      api, orderCol)

  /** [[apiTransformCheck]] over an ALREADY-ENRICHED (and materialized)
    * expected relation — for callers that hold the identical enrichment
    * output anyway (the `storm_api_check` gate builds its planted api
    * set from it), so the chain runs once per check instead of once in
    * the caller and again in here. The (raw in, derive-expected-myself)
    * entry above stays the J3 validator contract. */
  def apiTransformCheckOver(expected: DataFrame, api: DataFrame,
                            orderCol: String = "_row"): DataFrame = {
    // Both relations are read twice (field-compare join + missing-row
    // anti-join); `expected` arrives materialized, the dedup window is
    // materialized here (house read-twice pattern).
    val w = Window.partitionBy("id").orderBy(col(orderCol))
    val deduped = api.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .localCheckpoint(true)

    def close(c: String): Column =
      abs(col(s"e.$c") - col(s"a.$c")) < 1e-9 ||
        (col(s"e.$c").isNull && col(s"a.$c").isNull)
    def same(c: String): Column = col(s"e.$c") <=> col(s"a.$c")

    val checks: Seq[(String, Column)] = Seq(
      "event_type" -> same("event_type"),
      "lat" -> close("lat"), "lon" -> close("lon"),
      "magnitude" -> close("magnitude"),
      "unit" -> same("unit"), "severity" -> same("severity"),
      "event_time" -> same("event_time"),
      "location_name" -> same("location_name"),
      "location_distance" -> (close("location_distance") ||
        same("location_distance")),
      "location_direction" -> same("location_direction"),
      "state" -> same("state"), "county" -> same("county"),
      "source_office" -> same("source_office"),
      "time_bucket" -> same("time_bucket"))

    val joined = expected.as("e").join(deduped.as("a"), Seq("id"))
    // three-valued logic: a NULL comparison (one side null) must count as a
    // violation, not silently drop — coalesce to false like schemaAlignment.
    // ALL field checks evaluate in ONE pass over the joined relation (an
    // array of violated field names, exploded): a per-field filter+union
    // would re-scan and re-join the corpus once per compared field — 14
    // corpus scans at 100 TB for a single validation pass.
    val violArr = array(checks.map { case (name, ok) =>
      when(!coalesce(ok, lit(false)), lit(name))
    }: _*)
    val fieldViolations = joined
      .select(col("id"),
        explode(filter(violArr, x => x.isNotNull)).as("field"))
    val unmatched = expected.as("e")
      .join(deduped.select("id"), Seq("id"), "left_anti")
      .select(col("id"), lit("missing_in_api").as("field"))
    fieldViolations.unionByName(unmatched)
  }

  /** Phase 4 (F5): schema-domain alignment on the final API set — enum
    * membership, id prefixing, magnitude⟺severity consistency, required
    * fields, 2-char state (`cmd/validate/main.go:475-538`). Returns one
    * violation row per (id, rule). */
  def schemaAlignment(api: DataFrame): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "event_type_enum" -> col("event_type").isin("hail", "tornado", "wind"),
      "unit_enum" -> col("unit").isin("in", "mph", "f_scale"),
      "severity_enum" -> (col("severity").isNull ||
        col("severity").isin("minor", "moderate", "severe", "extreme")),
      "id_prefix" -> col("id").startsWith(concat(col("event_type"), lit("-"))),
      "severity_magnitude_consistency" ->
        ((col("magnitude") === 0 && col("severity").isNull) ||
          (col("magnitude") =!= 0 && col("severity").isNotNull)),
      "required_id" -> (length(col("id")) > 0),
      "required_event_time" -> col("event_time").isNotNull,
      "state_two_chars" -> (length(col("state")) === 2))
    rules.map { case (name, ok) =>
      api.filter(!coalesce(ok, lit(false))).select(col("id"), lit(name).as("rule"))
    }.reduce(_ unionByName _)
  }
}
