package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.LogEvent.{Uid, ExperimentId, Variant, Ts}
import graft.operators.Windows

/** The batch materialization of the reference's Redis keyspace
  * (SURVEY.md §1.2): one long-format metrics table
  * `(metric, dim, window_minute, value)` holding every pipeline
  * aggregate, written partitioned by metric family so the dashboard
  * read shapes (Q1–Q5) become partition-pruned point/range scans —
  * the relational equivalent of Redis key addressing.
  *
  * At 100 TB the store is the small output of the big aggregation;
  * partitioning by `metric` + sorting within files by `window_minute`
  * gives the 1 Hz dashboard reads (BASELINE.md) a path that touches
  * one partition directory and skips row groups by minute range.
  */
object MetricsTables {

  /** All per-minute metric families in one pass over the events — a
    * single wide aggregation, unioned into long format. `dim` is the
    * non-time dimension value ('' when the family has none). */
  def materialize(ev: DataFrame): DataFrame = {
    val m = Windows.minuteKey(col(Ts))
    def fam(name: String, dim: org.apache.spark.sql.Column,
        agg: org.apache.spark.sql.Column): DataFrame =
      ev.groupBy(m.as("window_minute"), dim.as("dim"))
        .agg(agg.as("value"))
        .select(lit(name).as("metric"), col("dim"),
          col("window_minute"), col("value"))
    fam("visitCounter", lit(""), count(lit(1)))
      .unionByName(fam("users", lit(""), countDistinct(col(Uid))))
      .unionByName(fam("experiments", lit(""), countDistinct(col(ExperimentId))))
      .unionByName(fam("variants", lit(""), countDistinct(col(Variant))))
      .unionByName(fam("evcounter", concat_ws("|", col(ExperimentId), col(Variant)),
        countDistinct(col(Uid))))
  }

  /** Write the store partitioned by metric family (Redis key-family ↔
    * partition directory), minute-sorted within files. */
  def write(store: DataFrame, path: String): Unit =
    store
      .repartition(col("metric"))
      .sortWithinPartitions(col("metric"), col("window_minute"))
      .write.mode("overwrite")
      .partitionBy("metric")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Q1–Q3 over the materialized store: a partition-pruned scan of one
    * family + broadcast spine join with zero-fill. `nowMinuteKey` pins
    * "now" (never wall clock). */
  def timeseries(store: DataFrame, metric: String,
      spine: DataFrame): DataFrame =
    spine.join(
        store.where(col("metric") === metric && col("dim") === "")
          .select(col("window_minute").as("minute_key"), col("value")),
        Seq("minute_key"), "left")
      .select(col("minute_key"), coalesce(col("value"), lit(0L)).as("value"))
      .orderBy("minute_key")
}
