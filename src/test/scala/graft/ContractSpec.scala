package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared driver-contract query must execute on the smallest
  * fixture — catches empty-input and tiny-group edge cases without
  * waiting for the oracle run. */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every SparkEntry query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, TestSpark.Sf0001).count(); None }
        catch { case t: Throwable => Some(s"$name: ${t.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
