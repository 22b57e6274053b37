package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing helpers.
  *
  * The reference assigns 1-minute tumbling windows purely by formatting
  * the event timestamp into a minute-granular key string
  * `'{prefix}_'yyyy_MM_dd'T'HH_mm` (reference:
  * MetricsCalculationPipeline.java:237-243, dashboard mirror
  * TimeSeriesKeyBuilder.java:26-38). Here the window is a proper
  * `date_trunc` column — the key string is rendered only at the
  * presentation edge, which also makes every oracle-checked output
  * timestamp a plain string (no parquet timestamp-encoding hazards).
  */
object Windows {

  /** Reference minute-key format (MetricsCalculationPipeline.java:237-239). */
  val MinuteKeyFormat = "yyyy_MM_dd'T'HH_mm"

  def minuteStart(ts: Column): Column = date_trunc("minute", ts)

  /** P11 — minute-granular bucket key, identical to the reference's
    * Redis key time component. */
  def minuteKey(ts: Column): Column = date_format(minuteStart(ts), MinuteKeyFormat)

  /** Q5 / the dashboard time spine: the last `lastMinutes` *closed*
    * minutes, i.e. minutes `t-N .. t-1` where `t` is "now" floored to
    * the minute — the current (incomplete) minute is excluded
    * (reference: TimeseriesMetricsController.java:144-152).
    *
    * "now" is pinned to `max(tsCol)` of the input for determinism
    * (never wall clock — SURVEY.md §7.3). Returns a single-column
    * DataFrame `minute_start: timestamp`, ascending. The spine is tiny
    * (N rows) so any join against it broadcasts.
    */
  def timeSpine(events: DataFrame, tsCol: Column, lastMinutes: Int): DataFrame = {
    events
      .agg(date_trunc("minute", max(tsCol)).as("now_m"))
      .select(explode(sequence(
        col("now_m") - expr(s"INTERVAL $lastMinutes MINUTES"),
        col("now_m") - expr("INTERVAL 1 MINUTES"),
        expr("INTERVAL 1 MINUTES"))).as("minute_start"))
  }

  /** Q1–Q3 read shape: left-join a per-minute aggregate onto the spine,
    * zero-filling missing buckets (reference:
    * TimeseriesMetricsController.java:55-67 — Redis `(nil)` → 0).
    *
    * `agg` must have columns (`minute_start: timestamp`, `valueCol`).
    * Output: (`minute_key: string`, `valueCol: long`) ascending by time.
    * The spine side is N rows → Catalyst broadcasts it; the aggregate
    * side was already reduced, so this join never shuffles big data.
    */
  def zeroFilledSeries(
      events: DataFrame, tsCol: Column, lastMinutes: Int,
      agg: DataFrame, valueCol: String): DataFrame = {
    val spine = timeSpine(events, tsCol, lastMinutes)
    spine.join(agg, Seq("minute_start"), "left")
      .select(
        date_format(col("minute_start"), MinuteKeyFormat).as("minute_key"),
        coalesce(col(valueCol), lit(0L)).as(valueCol))
      .orderBy("minute_key")
  }
}
