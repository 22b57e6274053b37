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
}
