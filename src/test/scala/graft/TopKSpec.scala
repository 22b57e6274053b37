package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.TopK
import graft.sources.Tables

/** The custom TopKPerGroup operator must agree exactly with the
  * window-function formulation (row_number + filter). */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topKPerGroup matches row_number window formulation on part table") {
    val part = Tables.part(spark, TestSpark.Sf0001)
    val custom = TopK.topKPerGroup(part,
        Seq("p_brand"),
        Seq("p_retailprice" -> true, "p_partkey" -> false), k = 3)
      .select(col("p_brand"), col("rank_in_group"), col("p_partkey"))
      .as[(String, Int, Long)].collect().toSet
    val viaWindow = graft.operators.Relational.topPartsPerBrand(part, 3)
      .select(col("p_brand"), col("price_rank"), col("p_partkey"))
      .as[(String, Int, Long)].collect().toSet
    assert(custom === viaWindow)
    assert(custom.nonEmpty)
  }

  test("bounded heap handles k larger than group size and duplicate sort keys") {
    val df = Seq(
      ("a", 5, 1L), ("a", 5, 2L), ("a", 3, 3L),
      ("b", 9, 4L)
    ).toDF("g", "v", "id")
    val got = TopK.topKPerGroup(df,
        Seq("g"), Seq("v" -> true, "id" -> false), k = 10)
      .select(col("g"), col("rank_in_group"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(("a", 1, 1L), ("a", 2, 2L), ("a", 3, 3L), ("b", 1, 4L)))
  }

  test("physical plan contains TopKPerGroupExec and no Sort") {
    val part = Tables.part(spark, TestSpark.Sf0001)
    val plan = TopK.topKPerGroup(part, Seq("p_brand"),
      Seq("p_retailprice" -> true, "p_partkey" -> false), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.toLowerCase.contains("sort "), s"unexpected sort in:\n$plan")
  }
}
