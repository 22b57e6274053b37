package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational extension suite over the TPC-H-ish star schema.
  *
  * The reference has no general joins, sorts, limits, window functions,
  * or grouping sets (SURVEY.md §2.5) — these queries extend the engine
  * to full relational coverage, exercising every join strategy Spark
  * offers (broadcast for bounded dims, shuffled hash/sort-merge for
  * fact-fact, semi/anti for existence), ranking windows, rollup, and
  * top-k, all as declarative plans Catalyst can optimize (filter
  * pushdown to parquet, column pruning, AQE join re-planning).
  *
  * Money arithmetic note: every aggregate over monetary doubles is
  * computed through explicit DECIMAL casts (exact, order-insensitive)
  * and converted to double only at the output edge. The SQL fragments
  * are shared verbatim with the DuckDB oracle so both engines evaluate
  * the identical exact expression — summing raw doubles would be
  * partition-order-dependent and could never hash-match an oracle.
  */
object Relational {

  /** Exact discounted price: extendedprice * (1 - discount), DECIMAL all the way. */
  val DiscPriceSql: String =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(5,2)) AS DECIMAL(18,4))"
  /** Exact charged price: disc_price * (1 + tax). */
  val ChargeSql: String =
    s"CAST($DiscPriceSql * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(5,2)) AS DECIMAL(24,6))"

  /** TPC-H Q1-style pricing summary: single-table scan + grouped
    * aggregate; the shipdate filter is pushed to the parquet scan and
    * partial aggregation reduces each partition to ≤|flag x status|
    * rows before the shuffle — the canonical map-side-combine shape. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") <= expr("TIMESTAMP '2001-09-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr(s"CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sum_qty"),
        expr(s"CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("sum_base_price"),
        expr(s"CAST(sum($DiscPriceSql) AS DOUBLE)").as("sum_disc_price"),
        expr(s"CAST(sum($ChargeSql) AS DOUBLE)").as("sum_charge"),
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(sum($DiscPriceSql) AS DOUBLE) AS sum_disc_price,
       |  CAST(sum($ChargeSql) AS DOUBLE) AS sum_charge,
       |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join narrowed by pushed
    * filters, then top-10 revenue. customer/orders are filtered before
    * the join (Catalyst pushes both), and the final TakeOrderedAndProject
    * avoids a global sort of the full join output. */
  def topOrdersByRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    customer.where(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
      .join(lineitem.where(col("l_shipdate") > expr("TIMESTAMP '1998-01-01 00:00:00'")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(expr(s"CAST(sum($DiscPriceSql) AS DOUBLE)").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  def topOrdersByRevenueSql: String =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       |  o_orderpriority, CAST(sum($DiscPriceSql) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style local-supplier revenue: 6-way join where the
    * customer and supplier must share a nation. region/nation are
    * bounded dims → explicit broadcast; the fact-side joins shuffle on
    * their keys and AQE re-plans the rest at runtime. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir).where(col("r_name") === "ASIA")
    val customer = Tables.customer(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
    val lineitem = Tables.lineitem(spark, sfDir)
    val supplier = Tables.supplier(spark, sfDir)
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(expr(s"CAST(sum($DiscPriceSql) AS DOUBLE)").as("revenue"))
      .orderBy("n_name")
  }

  def revenueByNationSql: String =
    s"""SELECT n_name, CAST(sum($DiscPriceSql) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Anti join: orders with no lineitems. At scale this is a shuffled
    * left-anti on the order key — no distinct/collect needed. */
  def ordersWithoutLineitems(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      .orderBy("o_orderkey")

  def ordersWithoutLineitemsSql: String =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Left-outer join preserved-side aggregate: per order priority, how
    * many orders, how many with no lineitems at all, and the total
    * lineitem count — the join-type counterpart to the anti-join
    * ([[ordersWithoutLineitems]]). The null-extended probe side is
    * detected via l_orderkey IS NULL, the idiomatic left-join survival
    * test. */
  def orderFillByPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        countDistinct(when(col("l_orderkey").isNull, col("o_orderkey")))
          .as("n_empty_orders"),
        count(col("l_orderkey")).as("n_lineitems"))
      .orderBy("o_orderpriority")

  val orderFillByPrioritySql: String =
    """SELECT o_orderpriority,
      |  count(DISTINCT o_orderkey) AS n_orders,
      |  count(DISTINCT CASE WHEN l_orderkey IS NULL THEN o_orderkey END)
      |    AS n_empty_orders,
      |  count(l_orderkey) AS n_lineitems
      |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Semi join + interval predicate (TPC-H Q4 flavor): orders with at
    * least one line shipped ≥60 days after the order date, counted per
    * priority. */
  def lateShipmentPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  def lateShipmentPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rollup (grouping sets): pricing totals at (flag, status), (flag),
    * and grand-total levels; NULL grouping slots rendered as 'ALL'. */
  def pricingRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_lines"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  def pricingRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY 1, 2""".stripMargin

  /** Analytic window functions: per-order line sequence + running
    * quantity. One shuffle on l_orderkey, sort within partitions —
    * the partition key is the natural data layout for lineitem, so at
    * scale this benefits from bucketing on l_orderkey.
    *
    * The window order includes l_quantity because (l_orderkey,
    * l_linenumber) is NOT unique in this data — without it the running
    * sum would be ambiguous wherever duplicate line numbers carry
    * different quantities. */
  def lineitemRunningWindow(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        expr("CAST(l_quantity AS DECIMAL(12,2))").as("qty_dec"))
      .withColumn("line_seq", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))
          .orderBy(col("l_shipdate"), col("l_linenumber"), col("qty_dec"))))
      .withColumn("running_qty", expr("CAST(sum(qty_dec) OVER (" +
        "PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, qty_dec " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"))
      .select(col("l_orderkey"), col("l_linenumber"), col("line_seq"),
        col("running_qty"))
      .orderBy("l_orderkey", "line_seq")

  def lineitemRunningWindowSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  row_number() OVER w AS line_seq,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |    PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, CAST(l_quantity AS DECIMAL(12,2))
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, CAST(l_quantity AS DECIMAL(12,2)))
      |ORDER BY l_orderkey, line_seq""".stripMargin

  /** Broadcast dim join + multi-level aggregate: average account
    * balance per market segment x nation. */
  def segmentNationBalance(customer: DataFrame, nation: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        expr("CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)").as("sum_acctbal"),
        expr("CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)").as("avg_acctbal"))
      .orderBy("c_mktsegment", "n_name")

  def segmentNationBalanceSql: String =
    """SELECT c_mktsegment, n_name, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Cube grouping sets: order counts at every combination of
    * (orderstatus, orderpriority), including both marginals and the
    * grand total; NULL slots rendered as 'ALL'. */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)").as("sum_totalprice"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("sum_totalprice"))
      .orderBy("orderstatus", "orderpriority")

  def ordersCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
      |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_totalprice
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY 1, 2""".stripMargin

  /** Exact interpolated percentiles of event value per type — the
    * sort-based aggregate family. Spark `percentile` and DuckDB
    * `quantile_cont` share the same linear-interpolation definition;
    * the inputs are 2-decimal doubles, so the single interpolation op
    * sees identical operands in both engines. */
  def valuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Sketch twin of [[valuePercentiles]]: `approx_percentile`
    * (a mergeable quantile summary with bounded per-group state — the
    * 100 TB path, where the exact sort-based percentile would shuffle
    * every value). Rows-only; error bound-checked against the exact
    * percentiles in PropertySpec. */
  def valuePercentilesApprox(events: DataFrame,
      accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        expr(s"approx_percentile(value, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(value, 0.9, $accuracy)").as("p90"),
        expr(s"approx_percentile(value, 0.99, $accuracy)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  def valuePercentilesSql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pivot (long → wide): per-user-bucket event counts, one column per
    * event type. The pivot values are EXPLICIT — letting Spark discover
    * them costs an extra distinct pass over the data and makes the
    * output schema data-dependent, both wrong at 100 TB. A pivot with
    * explicit values compiles to one pass of conditional counts
    * (map-side combined), no extra job. */
  def eventTypePivot(events: DataFrame,
      types: Seq[String] = EventTypes): DataFrame =
    events
      .groupBy(pmod(col("user_id"), lit(10L)).as("user_bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("user_bucket")

  /** The fixture's closed event-type vocabulary. */
  val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  def eventTypePivotSql(types: Seq[String] = EventTypes): String = {
    val cols = types.map(t =>
      s"""sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)::BIGINT AS "$t"""")
      .mkString(",\n|  ")
    s"""SELECT user_id % 10 AS user_bucket,
       |  $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Quantile rollup from pre-aggregated state — the PFMERGE pattern
    * for percentiles: one KLL sketch of `value` per minute (bounded
    * state, mergeable), then hourly percentiles by merging the MINUTE
    * SKETCHES, never re-reading raw events. At 100 TB this is how a
    * metrics store answers coarser-grained quantile questions from
    * stored per-window summaries; `approx_percentile` alone can't —
    * its result isn't mergeable, the KLL sketch is. Rows-only (sketch
    * estimates have no SQL oracle); RelationalSpec-style rank-bound
    * check lives in MetricsSpec. */
  def valueQuantileHourlyFromMinuteSketches(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(expr("kll_sketch_agg_double(value)").as("sk"))
      .groupBy(date_trunc("hour", col("m")).as("h"))
      // kll_sketch_merge_double is a pairwise scalar merge (no agg
      // form); fold the ≤60 minute sketches per hour — the fold is
      // interpreted but touches sketches, never rows
      .agg(collect_list(col("sk")).as("sks"))
      .withColumn("hsk", expr(
        "aggregate(slice(sks, 2, size(sks) - 1), sks[0], " +
          "(acc, x) -> kll_sketch_merge_double(acc, x))"))
      .select(date_format(col("h"), "yyyy_MM_dd'T'HH").as("hour_key"),
        expr("kll_sketch_get_quantile_double(hsk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_double(hsk, 0.95)").as("p95"))
      .orderBy("hour_key")

  /** Unpivot (wide → long), the inverse of [[eventTypePivot]]: melt the
    * per-type count columns back into (user_bucket, event_type, n)
    * rows via `stack` — a per-row expression, no shuffle or extra job
    * beyond the pivot's. Zero counts are kept (the round-trip preserves
    * the full grid), so the result is the dense long form of the same
    * aggregate. */
  def eventTypeUnpivot(events: DataFrame,
      types: Seq[String] = EventTypes): DataFrame = {
    val stackArgs = types.map(t => s"'$t', `$t`").mkString(", ")
    eventTypePivot(events, types)
      .select(col("user_bucket"),
        expr(s"stack(${types.length}, $stackArgs) AS (event_type, n)"))
      .orderBy("user_bucket", "event_type")
  }

  def eventTypeUnpivotSql(types: Seq[String] = EventTypes): String =
    s"""WITH spine AS (SELECT unnest([${types.map(t => s"'$t'").mkString(", ")}])
       |    AS event_type),
       |buckets AS (SELECT DISTINCT user_id % 10 AS user_bucket FROM events),
       |agg AS (
       |  SELECT user_id % 10 AS user_bucket, event_type, count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT b.user_bucket, s.event_type, coalesce(a.n, 0) AS n
       |FROM buckets b CROSS JOIN spine s
       |LEFT JOIN agg a ON a.user_bucket = b.user_bucket
       |  AND a.event_type = s.event_type
       |ORDER BY b.user_bucket, s.event_type""".stripMargin

  /** Semi-structured access via Spark 4's VARIANT type: `parse_json`
    * once into a variant column, then typed `variant_get` extraction —
    * the engine-native path for schemaless event properties (vs
    * per-access `get_json_object` string re-parsing: variant parses
    * once and stores a binary-encoded tree). Aggregates per k-bucket
    * with the decimal-cast money-sum convention. */
  def propsVariantStats(events: DataFrame): DataFrame =
    events
      .select(parse_json(col("props")).as("v"), col("value"))
      .select(expr("variant_get(v, '$.k', 'bigint')").as("k"), col("value"))
      .groupBy(pmod(col("k"), lit(10L)).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("sum_value"))
      .orderBy("k_mod")

  val propsVariantStatsSql: String =
    """SELECT (json_extract(props, '$.k')::BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Banded range join: every event matched to the value band
    * containing it. The bands side is bounded reference data →
    * `broadcast` makes the range predicate a per-row scan against an
    * in-memory table (BroadcastNestedLoop, linear in events, no
    * shuffle). For a bands table too large to broadcast, the scale path
    * bins both sides to fixed-width buckets and equi-joins on the
    * bucket (turning the range join into a per-bucket join), same as
    * the LSH/IVF bucketing elsewhere in the engine. */
  def valueBandCounts(events: DataFrame,
      bands: Seq[(Long, Double, Double)] = DemoBands): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val bandsDf = bands.toDF("band_id", "lo", "hi")
    events
      .join(broadcast(bandsDf),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("event_type"), col("band_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "band_id")
  }

  /** Non-overlapping demo bands covering the fixture value range. */
  val DemoBands: Seq[(Long, Double, Double)] = Seq(
    (0L, 0.0, 25.0), (1L, 25.0, 50.0), (2L, 50.0, 100.0),
    (3L, 100.0, 250.0), (4L, 250.0, 1000.0))

  def valueBandCountsSql(bands: Seq[(Long, Double, Double)] = DemoBands): String = {
    val rows = bands.map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")
    s"""WITH bands(band_id, lo, hi) AS (VALUES $rows)
       |SELECT event_type, band_id, count(*) AS n
       |FROM events JOIN bands ON value >= lo AND value < hi
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Correlated-subquery shape (TPC-H Q2 flavor): parts whose retail
    * price is the minimum within their type. Expressed as a join with
    * a grouped aggregate — the plan Catalyst's decorrelation would
    * produce for the subquery form the oracle uses, covering the
    * subquery/decorrelation surface the reference lacks. */
  def minPricePartPerType(part: DataFrame): DataFrame = {
    val minPrice = part.groupBy(col("p_type").as("mt"))
      .agg(min(col("p_retailprice")).as("min_price"))
    part.join(minPrice,
        col("p_type") === col("mt") && col("p_retailprice") === col("min_price"))
      .select(col("p_type"), col("p_partkey"), col("p_name"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE)").as("retail_price"))
      .orderBy("p_type", "p_partkey")
  }

  def minPricePartPerTypeSql: String =
    """SELECT p_type, p_partkey, p_name,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retail_price
      |FROM part p
      |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part
      |                       WHERE p_type = p.p_type)
      |ORDER BY p_type, p_partkey""".stripMargin

  /** The SQL front end: the pricing-summary query through
    * `spark.sql(...)` over a registered temp view — same semantics,
    * same oracle as [[pricingSummary]]. */
  def pricingSummaryViaSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(pricingSummarySql)
  }

  /** Correlated EXISTS decorrelation: customers with at least one
    * urgent order, summarized per market segment. One SQL text runs on
    * BOTH engines; Catalyst decorrelates the EXISTS into a left
    * semi-join (broadcast or shuffle as sizes dictate) — the subquery
    * never executes per-row. Complements the scalar-subquery
    * ([[minPricePartPerTypeSql]]) and anti-join
    * (`orders_without_lineitems`) decorrelation shapes. */
  val urgentCustomersSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  def urgentCustomersViaSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(urgentCustomersSql)
  }

  /** Top-k per group via ranking window (the "top 3 parts by retail
    * price per brand" shape): rank + filter, no global sort. */
  def topPartsPerBrand(part: DataFrame, k: Int = 3): DataFrame =
    part
      .withColumn("price_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))))
      .where(col("price_rank") <= k)
      .select(col("p_brand"), col("price_rank"), col("p_partkey"),
        col("p_name"))
      .orderBy("p_brand", "price_rank")

  def topPartsPerBrandSql(k: Int = 3): String =
    s"""SELECT p_brand, price_rank, p_partkey, p_name FROM (
       |  SELECT p_brand, p_partkey, p_name,
       |    row_number() OVER (PARTITION BY p_brand
       |      ORDER BY p_retailprice DESC, p_partkey) AS price_rank
       |  FROM part)
       |WHERE price_rank <= $k ORDER BY p_brand, price_rank""".stripMargin

  /** Explicit GROUPING SETS with `grouping()` markers — the general
    * form behind ROLLUP/CUBE (both already covered): four hand-picked
    * sets including the grand total, disambiguated by grouping flags
    * (cast to BIGINT: Spark's grouping() is tinyint, DuckDB's is
    * larger — the shared SQL text pins both to one type). One SQL
    * string runs verbatim on BOTH engines via [[groupingSetsViaSql]],
    * like [[pricingSummarySql]]. Spark expands grouping sets into a
    * single Expand + hash-aggregate: one shuffle for all four sets. */
  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  def groupingSetsViaSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(groupingSetsSql)
  }

  /** LATERAL correlated subquery (top-1-per-group as the dependent
    * join): for each nation, its highest-balance customer via an
    * ORDER BY … LIMIT 1 subquery that references the outer row. One
    * SQL text runs on BOTH engines; Catalyst rewrites the lateral into
    * a DomainJoin-decorrelated ranked join rather than executing the
    * subquery per outer row — the fourth decorrelation shape next to
    * scalar, EXISTS and anti. */
  val topCustomerLateralSql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 1) t
      |ORDER BY n.n_name""".stripMargin

  def topCustomerLateralViaSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    spark.sql(topCustomerLateralSql)
  }

  /** Null-safe equality join (`<=>` ≡ SQL IS NOT DISTINCT FROM): the
    * NULL-keyed group survives the join — a plain `=` join would
    * silently drop it, the classic bug when a dimension key is
    * optional. Keys are made nullable deterministically with `nullif`;
    * Spark plans `<=>` as an ordinary equi-join (hash/broadcast), not
    * a theta join, because null-safe equality is still a hashable
    * key comparison. */
  def nullSafeJoin(events: DataFrame): DataFrame = {
    val keyed = events.select(
      nullif(col("event_type"), lit("view")).as("key"))
    val counts = keyed.groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"))
    val dim = keyed.select(col("key"),
      coalesce(col("key"), lit("(none)")).as("tag")).distinct()
    counts.join(dim, counts("key") <=> dim("key"))
      .select(col("tag"), col("n_events"))
      .orderBy("tag")
  }

  val nullSafeJoinSql: String =
    """WITH e AS (SELECT nullif(event_type, 'view') AS key FROM events),
      |c AS (SELECT key, count(*) AS n_events FROM e GROUP BY 1),
      |d AS (SELECT DISTINCT key, coalesce(key, '(none)') AS tag FROM e)
      |SELECT d.tag, c.n_events
      |FROM c JOIN d ON c.key IS NOT DISTINCT FROM d.key
      |ORDER BY d.tag""".stripMargin

  /** Positional window picks (first_value / nth_value / last_value
    * over the full-partition frame): each customer's first, second and
    * latest order price in o_orderdate order. The frame must extend to
    * UNBOUNDED FOLLOWING — the default frame ends at CURRENT ROW,
    * which silently turns last_value into "current value" on both
    * engines. One row per customer via distinct (the windowed values
    * are partition-constant). */
  def orderValueExtremes(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    orders.select(col("o_custkey"),
        first_value(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        last_value(col("o_totalprice")).over(w).as("last_price"))
      .distinct()
      .orderBy("o_custkey")
  }

  val orderValueExtremesSql: String =
    """SELECT DISTINCT o_custkey,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price,
      |  last_value(o_totalprice) OVER w AS last_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey""".stripMargin

  /** Blocked fuzzy self-join: near-duplicate part names (edit distance
    * ≤ maxDist) found WITHOUT an all-pairs scan. The join key is the
    * (p_brand, p_type) block — an equi-join Catalyst plans as a plain
    * shuffle/broadcast hash join — and the quadratic levenshtein only
    * runs within a block (~n/150 rows each), turning O(n²) into
    * O(Σ blockᵢ²). The standard entity-resolution shape: blocking key
    * = cheap canopy, edit distance = expensive verifier. Skewed or
    * over-coarse blocks would re-introduce the quadratic — the same
    * remedy as [[graft.operators.Dedup]]'s maxDf stop-shingle rule
    * applies (cap or sub-salt hot blocks). */
  def fuzzyNameMatches(part: DataFrame, maxDist: Int = 2): DataFrame = {
    val a = part.select(col("p_brand"), col("p_type"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = part.select(col("p_brand"), col("p_type"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "p_type"))
      .where(col("key_a") < col("key_b") &&
        levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_close_pairs"),
        sum(when(col("name_a") === col("name_b"), 1L).otherwise(0L))
          .as("n_exact_dupes"),
        min(levenshtein(col("name_a"), col("name_b"))).as("min_dist"))
      .orderBy("p_brand")
  }

  def fuzzyNameMatchesSql(maxDist: Int = 2): String =
    s"""WITH pairs AS (
       |  SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b
       |  FROM part a JOIN part b
       |    ON a.p_brand = b.p_brand AND a.p_type = b.p_type
       |   AND a.p_partkey < b.p_partkey
       |  WHERE levenshtein(a.p_name, b.p_name) <= $maxDist)
       |SELECT p_brand, count(*) AS n_close_pairs,
       |  sum(CASE WHEN name_a = name_b THEN 1 ELSE 0 END)::BIGINT AS n_exact_dupes,
       |  min(levenshtein(name_a, name_b)) AS min_dist
       |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin
}
