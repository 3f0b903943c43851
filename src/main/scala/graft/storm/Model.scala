package graft.storm

import org.apache.spark.sql.types._

/** Domain model for enriched storm reports.
  *
  * Mirrors the reference's data model (storm-data-etl-service
  * `internal/domain/event.go:11-89`) re-expressed as Scala case classes /
  * Spark `StructType`s. One level of nesting (`geo`, `location`,
  * `measurement`) is preserved because the Kafka wire format is nested JSON.
  */
final case class Geo(lat: Double, lon: Double)

final case class Location(
    raw: String,
    name: String,
    distance: Option[Double],
    direction: Option[String],
    state: String,
    county: String)

final case class Measurement(
    magnitude: Double,
    unit: String,
    severity: Option[String])

final case class StormEvent(
    id: String,
    event_type: String,
    geo: Geo,
    measurement: Measurement,
    event_time: java.sql.Timestamp,
    location: Location,
    comments: String,
    source_office: String,
    time_bucket: java.sql.Timestamp,
    processed_at: java.sql.Timestamp)

/** Raw collector record: flat, all-string JSON mirroring NOAA SPC CSV
  * columns (`event.go:11-23`). One magnitude column per event type. */
final case class RawCSVRecord(
    Time: String,
    Size: String,
    F_Scale: String,
    Speed: String,
    Location: String,
    County: String,
    State: String,
    Lat: String,
    Lon: String,
    Comments: String,
    EventType: String)

object Model {

  /** Field order matches the collector JSON (`event.go:11-23`). */
  val rawFieldNames: Seq[String] = Seq(
    "Time", "Size", "F_Scale", "Speed", "Location", "County", "State",
    "Lat", "Lon", "Comments", "EventType")

  /** Explicit schema for `from_json` / CSV reads — never inferred. */
  val rawSchema: StructType =
    StructType(rawFieldNames.map(StructField(_, StringType, nullable = true)))

  /** Nested output schema matching the sink JSON contract
    * (`event.go:76-89`, `adapter/kafka/writer.go:55-68`). */
  val stormSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("event_type", StringType),
    StructField("geo", StructType(Seq(
      StructField("lat", DoubleType),
      StructField("lon", DoubleType)))),
    StructField("measurement", StructType(Seq(
      StructField("magnitude", DoubleType),
      StructField("unit", StringType),
      StructField("severity", StringType)))),
    StructField("event_time", TimestampType),
    StructField("location", StructType(Seq(
      StructField("raw", StringType),
      StructField("name", StringType),
      StructField("distance", DoubleType),
      StructField("direction", StringType),
      StructField("state", StringType),
      StructField("county", StringType)))),
    StructField("comments", StringType),
    StructField("source_office", StringType),
    StructField("time_bucket", TimestampType),
    StructField("processed_at", TimestampType)))
}
