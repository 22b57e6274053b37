package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("event_id", "user_id", "event_type", "ts_str")
      .selectExpr("event_id", "user_id", "event_type",
        "CAST(ts_str AS TIMESTAMP) AS ts")

  test("as-of picks the latest prior match per key; equal timestamps are inclusive") {
    val events = df(Seq(
      (1L, 10L, "click", "2026-08-12 10:00:00"),
      (2L, 10L, "click", "2026-08-12 10:05:00"),
      (3L, 10L, "purchase", "2026-08-12 10:07:00"), // → click 2
      (4L, 10L, "purchase", "2026-08-12 10:02:00"), // → click 1
      (5L, 20L, "purchase", "2026-08-12 10:01:00"), // no prior click → dropped
      (6L, 30L, "click", "2026-08-12 10:03:00"),
      (7L, 30L, "purchase", "2026-08-12 10:03:00") // same ts → inclusive, click 6
    ))
    val got = AsOf.purchaseAfterClick(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((3L, 10L, 2L), (4L, 10L, 1L), (7L, 30L, 6L)))
  }

  test("native sort-merge as-of matches the composed form on the edge fixture") {
    val events = df(Seq(
      (1L, 10L, "click", "2026-08-12 10:00:00"),
      (2L, 10L, "click", "2026-08-12 10:05:00"),
      (3L, 10L, "purchase", "2026-08-12 10:07:00"),
      (4L, 10L, "purchase", "2026-08-12 10:02:00"),
      (5L, 20L, "purchase", "2026-08-12 10:01:00"), // no prior click
      (6L, 30L, "click", "2026-08-12 10:03:00"),
      (7L, 30L, "purchase", "2026-08-12 10:03:00") // inclusive tie
    ))
    val native = AsOf.purchaseAfterClickNative(events)
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(native.as[(Long, Long, Long)].collect().toSet ===
      Set((3L, 10L, 2L), (4L, 10L, 1L), (7L, 30L, 6L)))
  }

  test("native as-of equals the composed form on the events table") {
    val events = graft.sources.Tables.events(spark, TestSpark.Sf0001)
    val composed = AsOf.purchaseAfterClick(events)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val native = AsOf.purchaseAfterClickNative(events)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("generic asofJoin keeps unmatched left rows with null payload") {
    val left = Seq((100L, 1L, "2026-08-12 09:00:00"))
      .toDF("event_id", "user_id", "ts_str")
      .selectExpr("event_id", "user_id", "CAST(ts_str AS TIMESTAMP) AS ts")
    val right = Seq((9L, 1L, "2026-08-12 10:00:00"))
      .toDF("click_id", "user_id", "ts_str")
      .selectExpr("user_id", "CAST(ts_str AS TIMESTAMP) AS ts", "click_id")
    val got = AsOf.asofJoin(left, right, "user_id", "ts", "ts", "click_id")
      .collect()
    assert(got.length === 1)
    assert(got.head.isNullAt(got.head.fieldIndex("asof_click_id")))
  }
}
