package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Changes

/** Edge-case semantics of the change-data operators over hand-built
  * fixtures (the oracle run covers the bulk shapes; these pin the
  * boundary behaviors a hash compare can mask). */
class ChangesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, String, String, Double, Long)*) =
    rows.toDF("user_id", "event_type", "ts_s", "value", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"), col("value"), col("event_id"))

  test("scd2History collapses runs, opens the last row, splits repeats") {
    // user 1: A A B A  -> 3 islands (A, B, A); user 2: single event
    val df = events(
      (1L, "A", "2026-01-01 10:00:00", 1.0, 1L),
      (1L, "A", "2026-01-01 10:01:00", 1.0, 2L),
      (1L, "B", "2026-01-01 10:02:00", 1.0, 3L),
      (1L, "A", "2026-01-01 10:03:00", 1.0, 4L),
      (2L, "C", "2026-01-01 09:00:00", 1.0, 5L))
    val out = Changes.scd2History(df).collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    // each validity row closes exactly where the next opens
    assert(u1.map(_.getString(3)).init.toSeq == u1.map(_.getString(2)).tail.toSeq)
    assert(u1.map(_.getBoolean(4)).toSeq == Seq(false, false, true))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getBoolean(4))
    assert(u2.head.getString(3) == "9999-12-31T00:00:00")
  }

  test("scd2History same-timestamp change splits on event_id order") {
    val df = events(
      (1L, "A", "2026-01-01 10:00:00", 1.0, 2L),
      (1L, "B", "2026-01-01 10:00:00", 1.0, 1L)) // B first by event_id
    val out = Changes.scd2History(df).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("B", "A"))
  }

  test("cdcApply: trailing delete removes the key; last write wins") {
    val df = events(
      (1L, "view", "2026-01-01 10:00:00", 10.0, 1L), // U
      (1L, "error", "2026-01-01 10:01:00", 0.0, 2L), // trailing D -> gone
      (2L, "signup", "2026-01-01 10:00:00", 5.0, 3L), // I
      (2L, "view", "2026-01-01 10:02:00", 7.0, 4L), // U wins
      (3L, "error", "2026-01-01 10:00:00", 0.0, 5L), // D then re-insert
      (3L, "signup", "2026-01-01 10:01:00", 9.0, 6L))
    val out = Changes.cdcApply(df).collect()
    assert(!out.exists(_.getLong(0) == 1L), "deleted key must be absent")
    val u2 = out.find(_.getLong(0) == 2L).get
    assert(u2.getString(1) == "U" && u2.getDouble(2) == 7.0 && u2.getLong(4) == 2L)
    val u3 = out.find(_.getLong(0) == 3L).get
    assert(u3.getString(1) == "I" && u3.getDouble(2) == 9.0)
  }

  test("cdcApply: same-timestamp ops resolve by event_id descending") {
    val df = events(
      (1L, "view", "2026-01-01 10:00:00", 1.0, 2L),
      (1L, "view", "2026-01-01 10:00:00", 2.0, 1L))
    val out = Changes.cdcApply(df).collect()
    assert(out.head.getDouble(2) == 1.0) // event_id 2 wins
  }

  test("ordersInFlightByMonth covers every month an order interval touches") {
    val orders = Seq(
      (1L, 100.0, "1995-01-15 00:00:00"), // Jan 15 + 30d = Feb 14 -> Jan, Feb
      (2L, 50.0, "1995-01-31 00:00:00"), // Jan 31 + 30d = Mar 2 -> Jan, Feb, Mar
      (3L, 10.0, "1995-03-01 00:00:00")) // Mar 1 + 30d = Mar 31 -> Mar
      .toDF("o_orderkey", "o_totalprice", "d")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("d").cast("timestamp").as("o_orderdate"))
    val out = Changes.ordersInFlightByMonth(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      "1995-01" -> (2L, 150.0),
      "1995-02" -> (2L, 150.0),
      "1995-03" -> (2L, 60.0)))
  }
}
