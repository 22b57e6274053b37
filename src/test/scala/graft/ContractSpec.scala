package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared driver-contract query must execute on the smallest
  * fixture — catches empty-input and tiny-group edge cases without
  * waiting for the oracle run. */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every SparkEntry query runs at sf0.001 — and no plan degenerates to a cartesian product") {
    // deliberate all-pairs / nested-loop shapes, each with a documented
    // scale story:
    //  - variant_overlap*: C(n,2) over a domain-bounded handful of
    //    variants (reference Q4)
    //  - knn_bruteforce, embedding_near_dup: the EXACT baselines that
    //    the LSH/IVF/minhash variants are the scale path for
    //  - knn_ivf: non-equi probe join against the BROADCAST query
    //    batch (bounded by construction)
    //  - value_band_counts: banded range join against a tiny broadcast
    //    band dim; bucketized equi-join is the documented scale path
    //  - tfidf_top_terms: crossJoin(broadcast(<1-row N-docs agg>)) —
    //    the scalar corpus size; a 1-row broadcast nested loop is free
    val cartesianOk = Set("variant_overlap", "variant_overlap_approx",
      "knn_bruteforce", "embedding_near_dup", "knn_ivf",
      "value_band_counts", "tfidf_top_terms")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, TestSpark.Sf0001)
          df.count()
          val plan = df.queryExecution.executedPlan.toString
          if (!cartesianOk(name) && (plan.contains("CartesianProduct") ||
              plan.contains("BroadcastNestedLoopJoin")))
            Some(s"$name: plan degenerated to an all-pairs join")
          else None
        }
        catch { case t: Throwable => Some(s"$name: ${t.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
