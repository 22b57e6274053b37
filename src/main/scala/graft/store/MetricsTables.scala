package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.LogEvent.{Uid, ExperimentId, Variant, Ts}
import graft.operators.Windows

/** The batch materialization of the reference's Redis keyspace
  * (SURVEY.md §1.2): one long-format metrics table
  * `(metric, dim, window_minute, value, sketch)` holding every pipeline
  * aggregate, written partitioned by metric family so the dashboard
  * read shapes (Q1–Q5) become partition-pruned point/range scans —
  * the relational equivalent of Redis key addressing.
  *
  * Distinct-count families carry their HLL SKETCH alongside the
  * materialized estimate — the store analog of the reference keeping
  * PFADD state rather than a number (README.md:22-30): sketches make
  * the store MERGEABLE, so a delta batch folds in with [[merge]]
  * (counter families by addition — INCRBY; sketch families by
  * register-max union — PFMERGE) without touching event history.
  * `value` for sketch families is the estimate (what PFCOUNT returns);
  * the exact oracle-checked variants live in the query surface, not
  * the store, exactly as in the reference.
  *
  * At 100 TB the store is the small output of the big aggregation;
  * partitioning by `metric` + sorting within files by `window_minute`
  * gives the 1 Hz dashboard reads (BASELINE.md) a path that touches
  * one partition directory and skips row groups by minute range.
  * Updates write a NEW versioned snapshot directory and flip a
  * pointer (the same atomic-replace convention as
  * [[graft.operators.Maintenance.upsert]]) — never overwrite a
  * directory being read.
  */
object MetricsTables {

  private val Keys = Seq("metric", "dim", "window_minute")

  /** All per-minute metric families in one pass over the events,
    * unioned into long format. `dim` is the non-time dimension value
    * ('' when the family has none). */
  def materialize(ev: DataFrame): DataFrame = {
    val m = Windows.minuteKey(col(Ts))
    def counterFam(name: String, dim: org.apache.spark.sql.Column): DataFrame =
      ev.groupBy(m.as("window_minute"), dim.as("dim"))
        .agg(count(lit(1)).as("value"))
        .select(lit(name).as("metric"), col("dim"), col("window_minute"),
          col("value"), lit(null).cast("binary").as("sketch"))
    def sketchFam(name: String, dim: org.apache.spark.sql.Column,
        member: String): DataFrame =
      ev.groupBy(m.as("window_minute"), dim.as("dim"))
        .agg(expr(s"hll_sketch_agg($member)").as("sketch"))
        .select(lit(name).as("metric"), col("dim"), col("window_minute"),
          expr("hll_sketch_estimate(sketch)").cast("long").as("value"),
          col("sketch"))
    counterFam("visitCounter", lit(""))
      .unionByName(sketchFam("users", lit(""), Uid))
      .unionByName(sketchFam("experiments", lit(""), ExperimentId))
      .unionByName(sketchFam("variants", lit(""), Variant))
      .unionByName(sketchFam("evcounter",
        concat_ws("|", col(ExperimentId), col(Variant)), Uid))
  }

  /** Fold a delta snapshot into the current store: counters add
    * (INCRBY), sketches union by register max (PFMERGE — exactly the
    * one-shot sketch, so folding is estimate-identical to a full
    * rebuild), estimates recomputed from the merged sketch. Both
    * inputs are key-domain-sized; events never re-aggregate. */
  def merge(cur: DataFrame, delta: DataFrame): DataFrame =
    cur.unionByName(delta)
      .groupBy(Keys.map(col): _*)
      .agg(sum(when(col("sketch").isNull, col("value"))).as("csum"),
        expr("hll_union_agg(sketch)").as("usk"))
      // branch on csum, not on the union result: hll_union_agg over an
      // all-null (counter) group returns an EMPTY sketch, not null —
      // its 0 estimate must never shadow the counter sum, and counter
      // rows keep a null sketch instead of the bogus empty one
      .select(col("metric"), col("dim"), col("window_minute"),
        when(col("csum").isNotNull, col("csum"))
          .otherwise(expr("hll_sketch_estimate(usk)"))
          .cast("long").as("value"),
        when(col("csum").isNotNull, lit(null).cast("binary"))
          .otherwise(col("usk")).as("sketch"))

  /** [[merge]] of the store with a new batch of raw events. */
  def update(cur: DataFrame, deltaEv: DataFrame): DataFrame =
    merge(cur, materialize(deltaEv))

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
