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
    * (reference: ParseMessageAsLogElement.java:44-49). The wire carries
    * `timestamp` as an ISO-8601 STRING — exactly what the reference's
    * generator emits (loggen/message_generator.py:88,
    * `%Y-%m-%dT%H:%M:%SZ`) and its Jackson+Joda reader parses. Keeping
    * the JSON field a string lets `from_json` skip the expensive
    * per-row formatter path; [[graft.sources.Tables.parseJsonEvents]]
    * converts with `try_cast` (Spark's hand-rolled ISO scanner), which
    * both benches ~40% faster and preserves the drop-on-bad-timestamp
    * semantics. */
  val jsonSchema: StructType = StructType(Seq(
    StructField("uid", StringType),
    StructField("experiment_id", StringType),
    StructField("variant", StringType),
    StructField("timestamp", StringType)))

  /** Wire timestamp render format (reference generator's second
    * precision). */
  val WireTsFormat = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** Canonical column names used throughout the engine. */
  val Uid = "uid"
  val ExperimentId = "experiment_id"
  val Variant = "variant"
  val Ts = "timestamp"
}
