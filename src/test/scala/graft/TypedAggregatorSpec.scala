package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TokenStats, TokenStatsAggregator}
import graft.operators.TextAnalysis

class TypedAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed UDAF: exact stats, identity zero, merge is order-insensitive") {
    val z = TokenStatsAggregator.zero
    val one = TokenStatsAggregator.reduce(z, 7L)
    assert(TokenStatsAggregator.merge(z, one) === one)
    assert(TokenStatsAggregator.merge(one, z) === one)
    val a = Seq(3L, 9L).foldLeft(z)(TokenStatsAggregator.reduce)
    val b = Seq(5L, 1L).foldLeft(z)(TokenStatsAggregator.reduce)
    assert(TokenStatsAggregator.merge(a, b) ===
      TokenStatsAggregator.merge(b, a))
    assert(TokenStatsAggregator.merge(a, b) === TokenStats(4L, 18L, 1L, 9L))
  }

  test("tokenStats query: results match a built-in formulation and survive repartitioning") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val viaUdaf = TextAnalysis.tokenStats(docs).collect().toSeq
    val viaUdafShuffled = TextAnalysis.tokenStats(docs.repartition(13))
      .collect().toSeq
    val builtin = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("total_tokens"),
        min("t").as("min_tokens"), max("t").as("max_tokens"))
      .orderBy("source").collect().toSeq
    assert(viaUdaf === builtin)
    assert(viaUdafShuffled === builtin)
  }
}
