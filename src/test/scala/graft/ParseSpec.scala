package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** P1 parse semantics: malformed JSON is silently dropped (reference:
  * ParseMessageAsLogElement.java:39-41 — log and skip, no dead-letter). */
class ParseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("malformed JSON and unparseable timestamps are dropped; valid rows parse") {
    val raw = Seq(
      """{"uid": "1", "experiment_id": "7", "variant": "default", "timestamp": "2026-08-12T10:15:03Z"}""",
      """this is not json at all""",
      """{"uid": "2", "experiment_id": "8"}""", // missing fields → null ts → drop
      """{"uid": "3", "experiment_id": "9", "variant": "1", "timestamp": "not-a-time"}""",
      """{"uid": "4", "experiment_id": "9", "variant": "2", "timestamp": "2026-08-12T10:16:00Z"}"""
    ).toDF("value")
    val parsed = Tables.parseJsonEvents(raw).collect()
    assert(parsed.map(_.getString(0)).sorted.toSeq === Seq("1", "4"))
    // snake_case JSON maps onto the typed schema
    val r = parsed.find(_.getString(0) == "1").get
    assert(r.getString(1) === "7")
    assert(r.getString(2) === "default")
    assert(r.getTimestamp(3).toInstant.toString === "2026-08-12T10:15:03Z")
  }

  test("round-trip: events table → JSON → parse preserves every row") {
    val events = Tables.events(spark, TestSpark.Sf0001)
    val raw = events.selectExpr(
      """to_json(named_struct(
        |'uid', CAST(user_id AS STRING),
        |'experiment_id', get_json_object(props, '$.k'),
        |'variant', event_type,
        |'timestamp', ts)) AS value""".stripMargin)
    assert(Tables.parseJsonEvents(raw).count() === events.count())
  }
}
