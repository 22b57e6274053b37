package graft

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference's single input record `LogEvent`
  * (reference: processor/.../pipeline/LogEvent.java:28-57): a flat,
  * fixed-schema click-stream event. All identity fields are strings
  * (never arithmetic); `timestamp` is event time — every windowed metric
  * derives from it (reference: MetricsCalculationPipeline.java:67,82,141).
  */
case class LogEvent(
    uid: String,
    experimentId: String,
    variant: String,
    timestamp: Timestamp)

object LogEvent {
  /** Wire schema of the JSON click-stream, snake_case field names
    * (reference: ParseMessageAsLogElement.java:44-49). */
  val jsonSchema: StructType = StructType(Seq(
    StructField("uid", StringType),
    StructField("experiment_id", StringType),
    StructField("variant", StringType),
    StructField("timestamp", TimestampType)))

  /** Canonical column names used throughout the engine. */
  val Uid = "uid"
  val ExperimentId = "experiment_id"
  val Variant = "variant"
  val Ts = "timestamp"
}
