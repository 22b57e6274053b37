package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.Metrics

/** Unit tests for the reference-parity metric operators, over the
  * hand-computed edge fixtures of FIXTURES.md §1: duplicate uid within
  * a minute, same uid across minutes, minute-boundary timestamps,
  * out-of-order (late) events, and overlap asymmetry. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Fixture (FIXTURES.md §1 edge rows):
    *  - u1 twice in 10:15 (dedup within bucket)
    *  - u1 again in 10:16 (counted once per minute, once all-time)
    *  - u2 exactly on the minute boundary 10:16:00
    *  - u3 late event for 10:15 listed after 10:16 rows (out of order)
    *  - u1 in variants "1" and "2"; u3 only in "1" (overlap asymmetry)
    */
  private lazy val fixture: DataFrame = Seq(
    ("u1", "e1", "1", "2026-08-12 10:15:03"),
    ("u1", "e1", "1", "2026-08-12 10:15:59"),
    ("u1", "e2", "2", "2026-08-12 10:16:30"),
    ("u2", "e1", "2", "2026-08-12 10:16:00"),
    ("u3", "e1", "1", "2026-08-12 10:15:30")
  ).toDF("uid", "experiment_id", "variant", "ts_str")
    .selectExpr("uid", "experiment_id", "variant",
      "CAST(ts_str AS TIMESTAMP) AS timestamp")

  test("visits_per_minute counts every event in its event-time minute") {
    val got = Metrics.visitsPerMinute(fixture).collect().toSeq
    assert(got === Seq(
      Row("2026_08_12T10_15", 3L),
      Row("2026_08_12T10_16", 2L)))
  }

  test("sliding windows: each event lands in exactly 5 overlapping 5-min windows") {
    val one = fixture.where("uid = 'u2'") // single event at 10:16:00
    val got = Metrics.visitsSliding(one).collect().toSeq
    // covering windows start at trunc(ts) − k minutes, k = 0..4
    assert(got === (12 to 16).map(m => Row(f"2026_08_12T10_$m%02d", 1L)))
    // full fixture: window sums equal the per-minute counts replayed ×5
    val total = Metrics.visitsSliding(fixture)
      .agg(org.apache.spark.sql.functions.sum("visits")).collect().head.getLong(0)
    assert(total === 5L * fixture.count())
  }

  test("rolling actives dedup the user across the trailing window") {
    // u1 appears in 10:15 AND 10:16: every window covering both
    // minutes must count it once. Labels are window STARTS: window s
    // covers [s, s+5min).
    val got = Metrics.rollingActiveUsers(fixture).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("2026_08_12T10_12") === 3L) // covers 10:12-10:16: u1,u2,u3
    assert(got("2026_08_12T10_11") === 2L) // covers 10:11-10:15: u1,u3
    assert(got("2026_08_12T10_16") === 2L) // covers 10:16-10:20: u1,u2
  }

  test("cohort retention: offset 0 holds the full cohort; later offsets only returners") {
    val got = Metrics.cohortRetention(fixture).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // cohort 10:15 = {u1, u3}; u1 returns at offset 1. cohort 10:16 = {u2}
    assert(got === Seq(
      ("2026_08_12T10_15", 0L, 2L),
      ("2026_08_12T10_15", 1L, 1L),
      ("2026_08_12T10_16", 0L, 1L)))
  }

  test("unique users dedup within minute; boundary event lands in its own minute") {
    val got = Metrics.uniqueUsersPerMinute(fixture).collect().toSeq
    // 10:15 = {u1, u3}; 10:16 = {u1, u2} — u1 counted once per bucket
    assert(got === Seq(
      Row("2026_08_12T10_15", 2L),
      Row("2026_08_12T10_16", 2L)))
  }

  test("all-time per-variant uniques count each uid once per variant") {
    val got = Metrics.uniqueUsersPerVariant(fixture).collect().toSeq
    assert(got === Seq(Row("1", 2L), Row("2", 2L)))
  }

  test("overlap: unordered pairs, no self-pairs, asymmetric membership") {
    val got = Metrics.variantOverlap(fixture).collect().toSeq
    // variants 1={u1,u3}, 2={u1,u2} → only pair (1,2) with overlap {u1}
    assert(got === Seq(Row("1", "2", 1L)))
  }

  test("input order does not change any result (late-data permutation invariance)") {
    val shuffled = fixture.orderBy(org.apache.spark.sql.functions.rand(7))
    assert(Metrics.visitsPerMinute(shuffled).collect().toSeq ===
      Metrics.visitsPerMinute(fixture).collect().toSeq)
    assert(Metrics.uniqueUsersPerMinute(shuffled).collect().toSeq ===
      Metrics.uniqueUsersPerMinute(fixture).collect().toSeq)
    assert(Metrics.variantOverlap(shuffled).collect().toSeq ===
      Metrics.variantOverlap(fixture).collect().toSeq)
  }

  test("time spine: last N closed minutes, current (max ts) minute excluded, zero-filled") {
    val got = Metrics.visitsTimeseries(fixture, lastMinutes = 3).collect().toSeq
    // "now" pinned to max(ts)=10:16:30 → spine 10:13..10:15; 10:16 excluded
    assert(got === Seq(
      Row("2026_08_12T10_13", 0L),
      Row("2026_08_12T10_14", 0L),
      Row("2026_08_12T10_15", 3L)))
  }

  test("approx distinct stays within 5*rsd of exact on real data") {
    val ev = graft.sources.Tables.logEvents(spark, TestSpark.Sf0001)
    val exact = Metrics.uniqueUsersPerVariant(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Metrics.uniqueUsersPerVariantApprox(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (v, e) =>
      val a = approx(v)
      assert(math.abs(a - e).toDouble / e <= 5 * 0.05,
        s"variant $v: approx $a vs exact $e")
    }
  }

  test("theta-sketch overlap tracks exact pairwise intersections") {
    val ev = graft.sources.Tables.logEvents(spark, TestSpark.Sf0001)
    val exact = Metrics.variantOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = Metrics.variantOverlapApprox(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(exact.keySet === est.keySet)
    exact.foreach { case (pair, e) =>
      val a = est(pair)
      // theta stores raw hashes until ~4k entries, so fixture-scale
      // intersections are near-exact; allow the documented ~3% envelope
      assert(math.abs(a - e).toDouble <= math.max(1.0, 0.03 * e),
        s"pair $pair: theta $a vs exact $e")
    }
  }

  test("hourly quantiles from merged minute KLL sketches sit at the right rank") {
    val events = graft.sources.Tables.events(spark, TestSpark.Sf0001)
    val est = graft.operators.Relational
      .valueQuantileHourlyFromMinuteSketches(events).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est.nonEmpty)
    import org.apache.spark.sql.functions._
    val perHour = events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy_MM_dd'T'HH").as("h"))
      .agg(count(lit(1)).as("n"), collect_list(col("value")).as("vs"))
      .collect()
    perHour.foreach { r =>
      val h = r.getString(0); val n = r.getLong(1)
      val vs = r.getSeq[Double](2).sorted
      val (p50, p95) = est(h)
      // KLL default accuracy: normalized rank error well under 2%; the
      // returned value's true rank must sit inside a ±5% rank window —
      // widened for sparse edge hours, where rank granularity is 1/n
      val tol = math.max(0.05, 1.5 / n)
      def rankOf(x: Double) = vs.count(_ <= x).toDouble / n
      assert(math.abs(rankOf(p50) - 0.5) <= tol, s"$h p50=$p50 rank=${rankOf(p50)} n=$n")
      assert(math.abs(rankOf(p95) - 0.95) <= tol, s"$h p95=$p95 rank=${rankOf(p95)} n=$n")
    }
  }

  test("hourly uniques from unioned minute sketches stay within HLL bounds of exact") {
    val ev = graft.sources.Tables.logEvents(spark, TestSpark.Sf0001)
    val est = Metrics.uniqueUsersHourlyFromMinuteSketches(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.date_trunc("hour", $"timestamp"),
          "yyyy_MM_dd'T'HH").as("hour_key"))
      .agg(org.apache.spark.sql.functions.countDistinct($"uid").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (h, e) =>
      assert(math.abs(est(h) - e).toDouble / e <= 0.15,
        s"hour $h: sketch ${est(h)} vs exact $e")
    }
  }

  test("driver contract: entry() returns rows and every query has its oracle dumped") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle key must have a queries entry (a dangling oracle
    // would make the driver's compare report a missing dump)
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql without queries: $dangling")
  }

  test("sum of per-minute visits equals total event count") {
    val ev = graft.sources.Tables.logEvents(spark, TestSpark.Sf0001)
    val total = ev.count()
    val summed = Metrics.visitsPerMinute(ev)
      .agg(org.apache.spark.sql.functions.sum("visits")).head().getLong(0)
    assert(summed === total)
  }
}
