package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert: update wins on collision, survivors keep values, inserts land") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B2", 99.0), (4L, "d", 40.0)).toDF("k", "v", "x")
    val got = Maintenance.upsert(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toList
    assert(got === List((1L, "a", 10.0), (2L, "B2", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert with an empty delta is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val got = Maintenance.upsert(base, base.limit(0), Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1).toList
    assert(got === List((1L, "a"), (2L, "b")))
  }

  test("mergeCounts folds delta aggregates: existing keys sum, new keys insert") {
    val snap = Seq(("a", 10L), ("b", 5L)).toDF("k", "visits")
    val delta = Seq(("b", 2L), ("c", 7L)).toDF("k", "visits")
    val got = Maintenance.mergeCounts(snap, delta, Seq("k"), "visits")
      .as[(String, Long)].collect().sortBy(_._1).toList
    assert(got === List(("a", 10L), ("b", 7L), ("c", 7L)))
  }

  test("incremental visits fold equals the one-shot aggregate (merge law)") {
    val ev = graft.sources.Tables.logEvents(spark, TestSpark.Sf0001)
    val folded = graft.operators.Metrics.visitsIncremental(ev)
      .as[(String, Long)].collect().toList
    val oneShot = graft.operators.Metrics.visitsPerMinute(ev)
      .as[(String, Long)].collect().toList
    assert(folded === oneShot)
  }

  test("snapshotDiff tags I/U/D, drops unchanged, and is null-safe") {
    val old = Seq((1L, Option("a")), (2L, Option("b")), (3L, None),
      (4L, Option("keep"))).toDF("k", "v")
    val neu = Seq((1L, Option("a2")), (3L, None), (4L, Option("keep")),
      (5L, Option("new"))).toDF("k", "v")
    val got = Maintenance.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .as[(Long, String, Option[String], Option[String])]
      .collect().sortBy(_._1).toList
    // k=3 null→null is unchanged (null-safe compare) and k=4 is equal:
    // neither may appear
    assert(got === List(
      (1L, "U", Some("a"), Some("a2")),
      (2L, "D", Some("b"), None),
      (5L, "I", None, Some("new"))))
  }

  test("snapshotDiff round-trips: applying the diff to old rebuilds new") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val neu = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("k", "v")
    val diff = Maintenance.snapshotDiff(old, neu, Seq("k"), Seq("v"))
    val touched = diff.select("k")
    val rebuilt = old.join(touched, Seq("k"), "left_anti")
      .unionByName(diff.where($"op" =!= "D")
        .select($"k", $"new_v".as("v")))
    assert(rebuilt.as[(Long, String)].collect().sorted.toList ===
      neu.as[(Long, String)].collect().sorted.toList)
  }
}
