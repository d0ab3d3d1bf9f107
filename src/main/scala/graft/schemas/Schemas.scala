package graft.schemas

import org.apache.spark.sql.types._

/** Canonical StructTypes for the reference's data model (SURVEY.md §1).
  *
  * The reference declares its schemas three times (Postgres DDL
  * `postgresql/init.sql`, Jackson case classes `models/Events.scala:19-38`,
  * warehouse/search field lists); here there is ONE declaration per model
  * and every reader/parser derives from it (SURVEY.md §1.3).
  */
object Schemas {

  /** `content` dimension — reference `postgresql/init.sql:2-9`. */
  val content: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("slug", StringType),
    StructField("title", StringType),
    StructField("content_type", StringType),
    StructField("length_seconds", IntegerType),   // null for non-media types
    StructField("publish_ts", TimestampType)
  ))

  /** `engagement_events` fact — reference `postgresql/init.sql:12-21`. */
  val engagementEvent: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("content_id", StringType),
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", StringType),          // ISO-8601 string in transit (Events.scala:25)
    StructField("duration_ms", IntegerType),      // null for click / null-length content
    StructField("device", StringType),
    StructField("raw_payload", StringType)        // JSON blob {session_id, ip, user_agent}
  ))

  /** Debezium ExtractNewRecordState envelope — reference
    * `models/Events.scala:19-38`, `debezium/postgres-connector.json:16-20`.
    * The flattened record plus CDC metadata columns. */
  val debeziumPayload: StructType = engagementEvent
    .add(StructField("__op", StringType))         // r|c|u|d
    .add(StructField("__table", StringType))
    .add(StructField("__db", StringType))
    .add(StructField("__ts_ms", LongType))

  /** Full envelope as it appears on the wire: `{"payload": {...}}`. */
  val debeziumEnvelope: StructType = StructType(Seq(
    StructField("payload", debeziumPayload)
  ))

  /** `raw_payload` inner JSON — reference `generate_data.py:123-127`. */
  val rawPayload: StructType = StructType(Seq(
    StructField("session_id", StringType),
    StructField("ip", StringType),
    StructField("user_agent", StringType)
  ))

  /** Enriched output record — reference `models/Events.scala:46-59`. */
  val enrichedEvent: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("content_id", StringType),
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", TimestampType),
    StructField("duration_ms", IntegerType),
    StructField("device", StringType),
    StructField("content_type", StringType),      // null on dim miss (row kept)
    StructField("length_seconds", IntegerType),
    StructField("engagement_seconds", DoubleType),
    StructField("engagement_pct", DoubleType),
    StructField("processing_time", TimestampType)
  ))
}

/** Typed views of the same models, for Dataset[T] code paths and tests. */
object Models {
  case class ContentInfo(id: String, contentType: String, lengthSeconds: Option[Int])

  case class EngagementEvent(
      id: Long, content_id: String, user_id: String, event_type: String,
      event_ts: String, duration_ms: Option[Int], device: String,
      raw_payload: String)

  case class EnrichedEvent(
      id: Long, content_id: String, user_id: String, event_type: String,
      event_ts: java.sql.Timestamp, duration_ms: Option[Int], device: String,
      content_type: Option[String], length_seconds: Option[Int],
      engagement_seconds: Option[Double], engagement_pct: Option[Double])
}
