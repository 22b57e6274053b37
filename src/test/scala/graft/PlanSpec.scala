package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.sources.Tables
import graft.operators.{Analytics, Relational, Metrics, Dedup}

/** Plan-shape assertions: the scale properties each operator is
  * designed around (broadcasts of small sides, map-side partial
  * aggregation, column pruning at the scan, partition pruning in the
  * metrics store) — so a refactor that silently loses one fails a test,
  * not a 100 TB run. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def plan(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes (codegen stages appear)
    df.queryExecution.executedPlan.toString
  }

  test("revenue_by_nation broadcasts every dimension side") {
    val p = plan(Relational.revenueByNation(spark, d))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the fact table is never on a broadcast side: no shuffle-hash or
    // sort-merge join should remain
    assert(!p.contains("SortMergeJoin"), "dimension join degenerated to SMJ")
  }

  test("pricing_summary aggregates partially before the shuffle") {
    val p = plan(Relational.pricingSummary(Tables.lineitem(spark, d)))
    // two HashAggregates (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
    // codegen stages render as "*(n) HashAggregate" in the final plan
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(p).isDefined,
      "agg not codegen'd: " + p.take(400))
  }

  test("pricing_summary scan prunes to the referenced columns only") {
    val qe = Relational.pricingSummary(Tables.lineitem(spark, d))
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(qe).getOrElse("")
    // 7 columns feed the aggregate; the 16-column table must not be
    // read whole
    assert(readSchema.nonEmpty, "no parquet scan in plan?")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"scan reads unused columns: $readSchema")
  }

  test("metric queries push the minute filter into partial aggregation") {
    val p = plan(Metrics.visitsPerMinute(Tables.logEvents(spark, d)))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
  }

  test("exact-Jaccard postings build is a single shuffle of the shingle stream") {
    val p = plan(Dedup.ngramJaccardPairs(Tables.documents(spark, d)))
    // shingle stream is shuffled once (groupBy shingle); downstream
    // exchanges operate on the much smaller postings/pairs frames. The
    // plan must not contain a shingle-keyed sort-merge self-join.
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  // AQE's toString prints "== Final Plan ==" then "== Initial Plan ==";
  // exchange-counting assertions must look at the final section only
  private def finalPlan(df: DataFrame): String =
    plan(df).split("== Initial Plan ==")(0)

  test("event_gaps: the groupBy reuses the window's user_id clustering — one shuffle") {
    val p = finalPlan(Analytics.eventGaps(Tables.events(spark, d)))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p.take(1200))
  }

  test("value_stats_by_type shuffles bounded partial-agg state, not rows") {
    val p = finalPlan(Analytics.valueStatsByType(Tables.events(spark, d)))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p.take(1200))
  }

  test("order_deciles never concentrates the sort on a single partition") {
    val p = plan(Analytics.orderDeciles(Tables.orders(spark, d)))
    assert(!p.contains("SinglePartition"), p.take(1200))
    assert(p.contains("rangepartitioning") || p.contains("REPARTITION_BY_RANGE"),
      p.take(1200))
  }

  test("top_customers_concat broadcasts the nation dimension") {
    val p = plan(Analytics.topCustomersConcat(
      Tables.customer(spark, d), Tables.nation(spark, d)))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("native as-of plans as a two-sided merge: no union, no window") {
    val p = finalPlan(graft.operators.AsOf.purchaseAfterClickNative(
      Tables.events(spark, d)))
    assert(p.contains("AsOfJoin"), p.take(800))
    assert(!p.contains("Union"), "native as-of should not materialize a union")
    assert(!p.contains("Window"), "native as-of should not use a window operator")
    // both sides exchanged onto the key and sorted — exactly two of each
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, p.take(1500))
  }

  test("metrics store timeseries read partition-prunes to one metric family") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store_plan").toString
    val ev = Tables.logEvents(spark, d)
    graft.store.MetricsTables.write(graft.store.MetricsTables.materialize(ev), dir)
    val store = graft.store.MetricsTables.read(spark, dir)
    val spine = Metrics.timesSpine(ev).select(org.apache.spark.sql.functions.col("minute_key"))
    val p = plan(graft.store.MetricsTables.timeseries(store, "visitCounter", spine))
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains(dir))
      .getOrElse("")
    assert(scanLine.nonEmpty, s"no store scan found in plan:\n${p.take(1200)}")
    assert("PartitionFilters: \\[[^\\]]*metric".r.findFirstIn(scanLine).isDefined,
      s"store scan not partition-pruned: $scanLine")
  }
}
