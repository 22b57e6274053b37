package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second batch of relational/analytic operators rounding out the
  * engine's SQL surface: lead/lag windows, set operations
  * (INTERSECT/EXCEPT), ntile bucketing, ordered string aggregation,
  * full-outer joins, regexp extraction, and moment statistics
  * (mean/stddev) computed deterministically from decimal sums.
  *
  * All money/metric doubles in the test tables carry exactly two
  * decimal digits, so every aggregate goes through the shared
  * `CAST(... AS DECIMAL(p,s))` fragments — evaluated verbatim by both
  * Spark (`expr`) and the DuckDB oracle — making sums order-independent
  * and hash-exact (see BASELINE.md / the pricing_summary convention).
  */
object Analytics {

  // ---- shared SQL fragments (Spark expr + DuckDB agree verbatim) ----
  // package-visible: StreamingMetrics.startVariantLift folds the SAME
  // fragments so the streamed arm state is definitionally the batch
  // aggregate (the spec keeps an independent inline copy as the
  // drift tripwire)
  private[graft] val SumValue =
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
  // value*value is a deterministic per-row IEEE double product; the
  // inputs are 2-decimal, so the 4-decimal cast is exact on both engines
  private[graft] val SumValueSq =
    "CAST(sum(CAST(value * value AS DECIMAL(20,4))) AS DOUBLE)"

  /** Per-user event cadence via lag(): number of events and the longest
    * gap in whole seconds between consecutive events (ordered by event
    * time, event_id tiebreak). The window shuffles once on user_id —
    * the same hash partitioning any per-user operator needs — and the
    * groupBy reuses that clustering (no second shuffle of the events).
    * Single-event users report gap 0. */
  def eventGaps(events: DataFrame): DataFrame = {
    // order by the full-precision ts (not the floored seconds) — two
    // events in the same second must sequence identically to the oracle
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("long").as("ts_s"))
      .withColumn("gap_sec", col("ts_s") - lag("ts_s", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        coalesce(max("gap_sec"), lit(0L)).as("max_gap_sec"))
      .orderBy("user_id")
  }

  val eventGapsSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  coalesce(max(gap_sec), 0) AS max_gap_sec
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Funnel segmentation via set operations: users who clicked AND
    * purchased (INTERSECT), clicked only, purchased only (EXCEPT).
    * Each leg is a distinct-project then a set op — Spark plans these
    * as hash aggregates/joins on user_id, all sharing one clustering. */
  def funnelSetOps(events: DataFrame): DataFrame = {
    val click = events.where(col("event_type") === "click")
      .select("user_id").distinct()
    val purchase = events.where(col("event_type") === "purchase")
      .select("user_id").distinct()
    def seg(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("segment"), col("n_users"))
    seg("click_and_purchase", click.intersect(purchase))
      .unionByName(seg("click_only", click.except(purchase)))
      .unionByName(seg("purchase_only", purchase.except(click)))
      .orderBy("segment")
  }

  val funnelSetOpsSql: String =
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT 'click_and_purchase' AS segment, count(*) AS n_users
      |  FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
      |UNION ALL
      |SELECT 'click_only', count(*)
      |  FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
      |UNION ALL
      |SELECT 'purchase_only', count(*)
      |  FROM (SELECT * FROM p EXCEPT SELECT * FROM c)
      |ORDER BY segment""".stripMargin

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    * multiplicities, unlike [[funnelSetOps]]' set forms: per user, the
    * click/purchase event multiset overlap (min of the two counts) and
    * the click surplus (clicks beyond purchases). Spark plans both as
    * one aggregate per side plus a join on replicated counts — no row
    * explosion. */
  def bagSetOps(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click").select("user_id")
    val purchases = events.where(col("event_type") === "purchase").select("user_id")
    val common = clicks.intersectAll(purchases)
      .groupBy("user_id").agg(count(lit(1)).as("n_common"))
    val surplus = clicks.exceptAll(purchases)
      .groupBy("user_id").agg(count(lit(1)).as("n_click_surplus"))
    common.join(surplus, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_click_surplus"), lit(0L)).as("n_click_surplus"))
      .orderBy("user_id")
  }

  val bagSetOpsSql: String =
    """WITH i AS (
      |  SELECT user_id, count(*) AS n_common FROM (
      |    SELECT user_id FROM events WHERE event_type = 'click'
      |    INTERSECT ALL
      |    SELECT user_id FROM events WHERE event_type = 'purchase')
      |  GROUP BY 1),
      |e AS (
      |  SELECT user_id, count(*) AS n_click_surplus FROM (
      |    SELECT user_id FROM events WHERE event_type = 'click'
      |    EXCEPT ALL
      |    SELECT user_id FROM events WHERE event_type = 'purchase')
      |  GROUP BY 1)
      |SELECT coalesce(i.user_id, e.user_id) AS user_id,
      |  coalesce(n_common, 0) AS n_common,
      |  coalesce(n_click_surplus, 0) AS n_click_surplus
      |FROM i FULL OUTER JOIN e ON i.user_id = e.user_id
      |ORDER BY user_id""".stripMargin

  /** Exact global ntile WITHOUT the single-partition sort Spark's
    * `ntile().over(Window.orderBy(...))` requires: range-repartition on
    * the sort key (every partition holds a disjoint key range, sorted
    * between partitions by construction), rank locally per range
    * partition (parallel — each window partition is one range
    * partition), then add the partition's global offset from a
    * P-row count pass and apply the exact ntile bucket formula
    * (first N mod k buckets get the extra row). Two scans + one range
    * shuffle; nothing ever concentrates on one task — the 100 TB shape
    * for exact quantile bucketing. Output: input columns + `bucket`.
    * Requires the sort to be total (pass tiebreaker columns). */
  def ntileByRange(df: DataFrame, sortCols: Seq[String], k: Int,
      partitions: Int = 32, eager: Boolean = false): DataFrame = {
    val (ranked, total) = rankByRange(df, sortCols, partitions, eager)
    ranked
      .withColumn("bucket", ntileOfRank("__rank", total, k))
      .drop("__rank")
  }

  /** The exact-ntile bucket of a global 1-based rank column: first
    * `total mod k` buckets hold one extra row (integral div; the q=0
    * guard is unreachable when total < k because every rank then lands
    * in the first branch). */
  def ntileOfRank(rankCol: String, total: Long, k: Int): Column = {
    val q = total / k
    val m = total % k
    expr(
      s"""CAST(IF($m > 0 AND $rankCol <= ${m * (q + 1)},
         |  ($rankCol - 1) div ${q + 1} + 1,
         |  $m + ($rankCol - 1 - ${m * (q + 1)}) div ${math.max(q, 1L)} + 1)
         |AS BIGINT)""".stripMargin)
  }

  /** The staged (pre-checkpoint) frame of [[rankByRange]]: the range
    * exchange plus the captured partition-id stamp. Exposed separately
    * because `localCheckpoint()` hides everything upstream of it
    * behind `Scan ExistingRDD` in the executed plan — plan tests that
    * want to assert the rank's range-repartition shape must inspect
    * THIS frame (asserting `rangepartitioning` on a rankByRange
    * caller's final plan only sees whatever trailing orderBy the
    * caller added, which would keep passing even if the rank's own
    * exchange regressed). */
  def rankByRangeStaging(df: DataFrame, sortCols: Seq[String],
      partitions: Int = 32): DataFrame =
    df.repartitionByRange(partitions, sortCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())

  /** Exact global ROW_NUMBER as data: ONE construction-time driver job
    * computes per-range-partition row counts AND realized minimum key
    * tuples over the KEY COLUMNS ONLY (column-pruned scan, key-only
    * range shuffle — the full rows never move at construction), then
    * the returned frame is fully LAZY: a literal CASE over the
    * collected bounds stamps each row's range-bucket, a bucket-
    * partitioned local row_number plus the bucket's literal prefix
    * offset is the exact global rank. Returns the input plus a 1-based
    * `__rank` column, and the total row count.
    *
    * Correctness does NOT depend on exchange reuse or on re-sampled
    * range bounds (the r18-rejected in-plan design's cliff): the
    * bucket of a row is a deterministic pure function of its key and
    * the collected literals, so the counts job and the rank pass
    * cannot disagree on the partition assignment. The realized mins
    * of a range partitioning are valid split points because range
    * partitioning is monotone and maps equal keys to equal partitions
    * — every key in partition i is strictly below partition i+1's
    * minimum. vs the pre-r19 checkpoint design this saves one driver
    * job and the corpus-wide checkpoint write/read per call (measured
    * across the six heaviest callers: dpo_pairs 5.1 → 3.4 s warm) at
    * the price of re-deriving `df` lineage at action time — callers
    * that consume the ranked frame more than once re-execute it
    * (exchange reuse dedupes the shuffle work when both consumers sit
    * in one action).
    *
    * REQUIREMENTS: the sort must be total (pass tiebreaker columns),
    * `df` deterministic (same rows at construction and action — every
    * catalog caller already needs this for oracle exactness), and the
    * sort columns non-null: a null in any collected min tuple falls
    * back to [[rankByRangeCheckpointed]], whose window handles nulls.
    *
    * `eager = true` routes to [[rankByRangeCheckpointed]] outright —
    * the right mode for CHAINED ranks (rank k's input contains rank
    * k−1's window: lazily each construction job would re-execute every
    * predecessor window, measured QUADRATIC blowup on dpo_pairs
    * 5.1 → 9.9 s before the flag; the checkpoint materializes each
    * link once) and for upstreams too expensive to re-derive. */
  def rankByRange(df: DataFrame, sortCols: Seq[String],
      partitions: Int = 32, eager: Boolean = false): (DataFrame, Long) = {
    if (eager) return rankByRangeCheckpointed(df, sortCols, partitions)
    val cols = sortCols.map(col)
    val keyed = df.select(cols: _*)
    val keyTypes = keyed.schema.fields.map(_.dataType)
    // one job: key-only range exchange (the partitioner is the bound
    // SAMPLER here — its assignment is captured, not re-relied-upon),
    // per-partition count + realized min tuple, collected as literals
    val stats = rankByRangeStaging(keyed, sortCols, partitions)
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"), min(struct(cols: _*)).as("__lo"))
      .collect()
      .sortBy(_.getInt(0))
    val total = stats.map(_.getLong(1)).sum
    val loRows = stats.map(_.getStruct(2))
    if (loRows.exists(r => keyTypes.indices.exists(r.isNullAt)))
      return rankByRangeCheckpointed(df, sortCols, partitions)
    // lexicographic key >= bound, expanded per column so every
    // comparison codegens on the native type (NaN/-0.0 follow Spark's
    // sort-consistent comparison semantics)
    def geq(lo: Row): Column =
      cols.zip(keyTypes.zipWithIndex.map { case (dt, i) =>
        lit(lo.get(i)).cast(dt)
      }).foldRight(Option.empty[Column]) { case ((c, v), rest) =>
        Some(rest.fold(c >= v)(r => (c > v) || (c === v && r)))
      }.get
    // bucket = index of the greatest realized min <= key; the fold
    // nests ascending bounds so the OUTERMOST when tests the highest
    val bucketCol = loRows.toSeq.drop(1).zipWithIndex
      .foldLeft(lit(1)) { case (acc, (lo, i)) =>
        when(geq(lo), lit(i + 2)).otherwise(acc)
      }
    val offsets = stats.map(_.getLong(1)).scanLeft(0L)(_ + _).init
    def offCol(b: Column): Column = offsets.zipWithIndex
      .foldLeft(lit(0L)) { case (acc, (off, i)) =>
        when(b === (i + 1), lit(off)).otherwise(acc)
      }
    val localW = Window.partitionBy(col("__bucket")).orderBy(cols: _*)
    (df.withColumn("__bucket", bucketCol)
      .withColumn("__rank",
        (row_number().over(localW) + offCol(col("__bucket"))).cast("long"))
      .drop("__bucket"), total)
  }

  /** The pre-r19 [[rankByRange]] implementation — retained as the
    * null-sort-key fallback (the literal-bounds CASE cannot express
    * NULLS FIRST without null-safe comparators; no catalog caller
    * ranks nullable keys, so this path is cold). */
  private[operators] def rankByRangeCheckpointed(df: DataFrame,
      sortCols: Seq[String], partitions: Int = 32): (DataFrame, Long) = {
    // stamp the range-partition id ONCE and localCheckpoint: the count
    // pass and the ranking pass must see the same partition assignment,
    // and a re-executed range exchange does not guarantee that (AQE may
    // remix the two jobs differently). localCheckpoint over persist
    // because the returned frame is LAZY: an explicit persist here has
    // no matching unpersist site and would pin a corpus-sized cache for
    // the session lifetime (callers multiplied this round:
    // order_deciles, perplexity_buckets, curriculum_order,
    // length_batching) — checkpoint blocks are released by the
    // ContextCleaner when the caller drops the frame. At cluster scale
    // this materialization is the sorted staging write an exact global
    // bucketing needs anyway. Trade-offs localCheckpoint buys that
    // win with: (a) it TRUNCATES lineage, so after executor loss the
    // checkpointed blocks are unrecoverable and the job fails instead
    // of recomputing — on a real cluster with preemption, swap in
    // reliable `checkpoint()` (HDFS-backed) or persist+unpersist at
    // the call sites; (b) it runs a materialization job eagerly at
    // DataFrame-CONSTRUCTION time, so even explain-only callers pay
    // one pass over `df`.
    val cols = sortCols.map(col)
    val ranged = rankByRangeStaging(df, sortCols, partitions)
      .localCheckpoint()
    val counts = ranged
      .groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val pids = counts.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)))
      .toMap // pid -> rows in lower-ranged partitions
    // key the offset off the CAPTURED __pid column: spark_partition_id()
    // re-evaluated after the window's hash shuffle would read the
    // shuffle's partition ids, not the range partitions'
    def offCol(pid: Column): Column = pids.foldLeft(lit(0L)) { (acc, p) =>
      when(pid === p, lit(offsets(p))).otherwise(acc)
    }
    val localW = Window.partitionBy(col("__pid")).orderBy(cols: _*)
    (ranged
      .withColumn("__rank",
        (row_number().over(localW) + offCol(col("__pid"))).cast("long"))
      .drop("__pid"), total)
  }

  /** Order-value deciles: per-decile count, min/max and decimal-exact
    * sum of o_totalprice, bucketed by [[ntileByRange]] — the
    * range-partitioned exact-ntile plan (no single-partition
    * WindowExec; AnalyticsSpec asserts equality with `ntile().over`
    * and the DuckDB oracle checks it end-to-end). */
  def orderDeciles(orders: DataFrame): DataFrame = {
    ntileByRange(orders, Seq("o_totalprice", "o_orderkey"), 10)
      .withColumnRenamed("bucket", "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_price"))
      .orderBy("decile")
  }

  /** Population Stability Index over the value stream — the standard
    * production drift metric for NUMERIC features (the banking/ML-ops
    * convention: PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur) over the
    * reference period's decile bins; < 0.1 stationary, > 0.25 act):
    * split events into two halves by EVENT TIME (exact NTILE(2) over
    * (ts, event_id)), bin the whole stream by the REFERENCE half's
    * exact decile edges, and report each bin's reference/current
    * shares and its quantized PSI term. The numeric sibling of
    * [[graft.operators.Corpus.corpusDrift]]'s distributional KL.
    *
    * Scale shape: both NTILEs are [[ntileByRange]] (range-partitioned
    * exact ranks — no single-partition window); the 9 inner edges are
    * a BOUNDED driver collect (bins−1 doubles, the k-means-sums
    * discipline) folded back in as one array literal, so bin
    * assignment is a zero-join scan-side filter-count. Exactness:
    * bin counts are integers; shares are single IEEE divisions by the
    * arithmetically-derived half sizes; `ln` rides the
    * [[graft.operators.Corpus.sourceKlDivergence]] DECIMAL(18,9)
    * lattice; the 1e-6 floor (the standard empty-bin guard) is an
    * exact double literal in both engines. Output: (bin, n_ref,
    * n_cur, p_ref, p_cur, psi_term). */
  def valuePsi(events: DataFrame, bins: Int = 10): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("value"))
      .where(col("value").isNotNull)
    // eager: halves is consumed twice (the reference-decile branch
    // chains on it AND the final binning reads it)
    val halves = ntileByRange(base, Seq("ts", "event_id"), 2, eager = true)
      .withColumnRenamed("bucket", "half")
    val n = base.count()
    val nRef = n / 2 + n % 2
    val nCur = n / 2
    // eager: chained on the halves ntile above
    val refDeciles = ntileByRange(
      halves.where(col("half") === 1).select(col("value"), col("event_id")),
      Seq("value", "event_id"), bins, eager = true)
    // the bins−1 inner edges: each reference decile's max value
    val edges = refDeciles.groupBy(col("bucket"))
      .agg(max(col("value")).as("edge"))
      .where(col("bucket") < bins)
      .orderBy("bucket").collect().map(_.getDouble(1))
    val eLit = typedLit(edges)
    halves
      .withColumn("bin",
        (lit(1) + size(filter(eLit, e => col("value") > e))).cast("long"))
      .groupBy(col("bin"))
      .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("half") === 2, 1L).otherwise(0L)).as("n_cur"))
      .withColumn("p_ref", expr(
        s"greatest(CAST(n_ref AS DOUBLE) / CAST($nRef AS DOUBLE), 1e-6)"))
      .withColumn("p_cur", expr(
        s"greatest(CAST(n_cur AS DOUBLE) / CAST($nCur AS DOUBLE), 1e-6)"))
      .withColumn("psi_term", expr(
        """CAST(CAST(floor(
          |  CAST(CAST(ln(p_ref / p_cur) AS DECIMAL(18,9)) AS DOUBLE)
          |  * (p_ref - p_cur) * 1e9 + 0.5) / 1e9
          |AS DECIMAL(18,9)) AS DOUBLE)""".stripMargin))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("psi_term"))
      .orderBy("bin")
  }

  /** DuckDB replay of [[valuePsi]]: NTILE halves and reference
    * deciles over the same total orders, the same strict `>` edge
    * comparison (correlated count over the bins−1 edge rows), the
    * same floored shares and quantized-ln terms. */
  def valuePsiSql(bins: Int = 10): String =
    s"""WITH base AS (
       |  SELECT event_id, ts, value FROM events WHERE value IS NOT NULL),
       |nn AS (SELECT count(*) AS n FROM base),
       |h AS (
       |  SELECT event_id, value,
       |    ntile(2) OVER (ORDER BY ts, event_id) AS half
       |  FROM base),
       |rd AS (
       |  SELECT value,
       |    ntile($bins) OVER (ORDER BY value, event_id) AS bucket
       |  FROM h WHERE half = 1),
       |ed AS (SELECT bucket, max(value) AS edge FROM rd
       |       WHERE bucket < $bins GROUP BY 1),
       |b AS (
       |  SELECT h.half,
       |    1 + (SELECT count(*) FROM ed WHERE h.value > ed.edge) AS bin
       |  FROM h),
       |c AS (
       |  SELECT bin,
       |    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
       |    sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)::BIGINT AS n_cur
       |  FROM b GROUP BY 1),
       |p AS (
       |  SELECT bin::BIGINT AS bin, n_ref, n_cur,
       |    greatest(CAST(n_ref AS DOUBLE)
       |      / CAST((SELECT n // 2 + n % 2 FROM nn) AS DOUBLE), 1e-6)
       |      AS p_ref,
       |    greatest(CAST(n_cur AS DOUBLE)
       |      / CAST((SELECT n // 2 FROM nn) AS DOUBLE), 1e-6) AS p_cur
       |  FROM c)
       |SELECT bin, n_ref, n_cur, p_ref, p_cur,
       |  CAST(CAST(floor(
       |    CAST(CAST(ln(p_ref / p_cur) AS DECIMAL(18,9)) AS DOUBLE)
       |    * (p_ref - p_cur) * 1e9 + 0.5) / 1e9
       |  AS DECIMAL(18,9)) AS DOUBLE) AS psi_term
       |FROM p ORDER BY bin""".stripMargin

  val orderDecilesSql: String =
    """WITH d AS (
      |  SELECT o_totalprice,
      |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT decile, count(*) AS n_orders,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** Ordered string aggregation: per nation, the top-3 customers by
    * account balance as a comma-joined list (rank order). Spark has no
    * ordered string_agg — the deterministic formulation is rank-filter
    * (top-k per group), then `array_sort` over (rank, name) structs and
    * a transform+concat_ws; collect_list alone is partition-order
    * dependent. The dimension join broadcasts (25 nations). */
  def topCustomersConcat(customer: DataFrame, nation: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val top = customer
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .groupBy("c_nationkey")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("rk"), col("c_name")))),
          x => x.getField("c_name"))).as("top_customers"))
    top.join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("top_customers"))
      .orderBy("n_name")
  }

  val topCustomersConcatSql: String =
    """WITH r AS (
      |  SELECT c_nationkey, c_name,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY c_acctbal DESC, c_name) AS rk
      |  FROM customer)
      |SELECT n_name, string_agg(c_name, ',' ORDER BY rk) AS top_customers
      |FROM r JOIN nation ON c_nationkey = n_nationkey
      |WHERE rk <= 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Full-outer join of two independent aggregates: per nation key, how
    * many customers vs suppliers and their decimal-exact balance
    * totals, keeping nations present on only one side. Both inputs are
    * pre-aggregated to ≤ |nations| rows BEFORE the join — the outer
    * join never sees fact-table cardinality. */
  def nationAccountsFull(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))")
          .as("cbal"))
    val s = supplier.groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        expr("CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))")
          .as("sbal"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("cbal"), lit(0)).cast("double").as("customer_bal"),
        coalesce(col("sbal"), lit(0)).cast("double").as("supplier_bal"))
      .orderBy("nationkey")
  }

  val nationAccountsFullSql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS nationkey, count(*) AS n_customers,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS cbal
      |  FROM customer GROUP BY 1),
      |s AS (
      |  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers,
      |    sum(CAST(s_acctbal AS DECIMAL(18,2))) AS sbal
      |  FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |  coalesce(n_customers, 0) AS n_customers,
      |  coalesce(n_suppliers, 0) AS n_suppliers,
      |  CAST(coalesce(cbal, 0) AS DOUBLE) AS customer_bal,
      |  CAST(coalesce(sbal, 0) AS DOUBLE) AS supplier_bal
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin

  /** Regexp extraction + aggregate: group parts by the color word
    * leading p_name, with decimal-exact price stats. The regexp runs
    * inside whole-stage codegen on the scan side; only (color, partial
    * agg) pairs shuffle. */
  def partColorStats(part: DataFrame): DataFrame =
    part
      .select(regexp_extract(col("p_name"), "^(\\w+)", 1).as("color"),
        col("p_retailprice"))
      .groupBy("color")
      .agg(count(lit(1)).as("n_parts"),
        expr("CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_retail"))
      .withColumn("avg_retail",
        expr("sum_retail / CAST(n_parts AS DOUBLE)"))
      .orderBy("color")

  val partColorStatsSql: String =
    """WITH g AS (
      |  SELECT regexp_extract(p_name, '^(\w+)', 1) AS color,
      |    count(*) AS n_parts,
      |    CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_retail
      |  FROM part GROUP BY 1)
      |SELECT color, n_parts, sum_retail,
      |  sum_retail / CAST(n_parts AS DOUBLE) AS avg_retail
      |FROM g ORDER BY color""".stripMargin

  /** Keep-first dedup: the earliest event per (user, minute) — the
    * classic at-least-once ingestion cleanup. Written in the
    * `row_number() ≤ 1` idiom, which [[graft.plans.TopKRewriteRule]]
    * rewrites to bounded per-group heaps (k=1: a running min — no
    * per-group sort, no spill) in sessions with GraftExtensions; in
    * plain sessions it runs as a standard window. One shuffle on the
    * dedup key either way. */
  def firstEventPerUserMinute(events: DataFrame): DataFrame = {
    val keyed = events.withColumn("minute_key",
      date_format(date_trunc("minute", col("ts")), "yyyy_MM_dd'T'HH_mm"))
    val w = Window.partitionBy("user_id", "minute_key")
      .orderBy("ts", "event_id")
    keyed
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 1)
      .select(col("user_id"), col("minute_key"), col("event_id"),
        col("event_type"))
      .orderBy("user_id", "minute_key")
  }

  val firstEventPerUserMinuteSql: String =
    """WITH r AS (
      |  SELECT user_id,
      |    strftime(date_trunc('minute', ts), '%Y_%m_%dT%H_%M') AS minute_key,
      |    event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id,
      |      date_trunc('minute', ts) ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT user_id, minute_key, event_id, event_type
      |FROM r WHERE rn <= 1 ORDER BY user_id, minute_key""".stripMargin

  /** Rank-function family over one window: dense_rank, percent_rank,
    * and cume_dist of order value within each priority class, for the
    * 3 largest-value orders per class (row_number-bounded so the output
    * stays report-sized). percent_rank = (rank−1)/(n−1) and cume_dist =
    * peers/n are exact rationals of counts — identical doubles on both
    * engines. One window partition clustering serves all five
    * functions. */
  def orderPriceRanks(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .where(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("dr"), col("pr"), col("cd"))
      .orderBy("o_orderpriority", "rn")
  }

  val orderPriceRanksSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    row_number() OVER w AS rn,
      |    dense_rank() OVER w AS dr,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice DESC, o_orderkey))
      |SELECT o_orderpriority, rn, o_orderkey, dr, pr, cd
      |FROM r WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  /** Calendar rollup: orders per (year, month) with decimal-exact
    * revenue — the date-part extraction + group-by shape of every
    * reporting pipeline. Group keys are 8-byte ints derived in the
    * scan; the string-free grouping is the cheap form at scale. */
  def ordersByMonth(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("revenue"))
      .orderBy("o_year", "o_month")

  val ordersByMonthSql: String =
    """SELECT extract(year FROM o_orderdate) AS o_year,
      |  extract(month FROM o_orderdate) AS o_month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Month-over-month revenue change — the period-over-period reporting
    * shape (lag over an ordered calendar axis + relative delta). The
    * global-ORDER-BY window runs AFTER the monthly rollup, over a
    * calendar-domain-sized frame (≤ 12·years rows regardless of input
    * scale), so the single-partition WindowExec that is forbidden on
    * fact data is harmless here. Revenue stays DECIMAL through the
    * rollup and the lag; the relative change divides identical
    * decimal-derived doubles and quantizes to 8 decimals — engine-
    * reproducible like every float edge in this file. First month has
    * no predecessor → NULL change on both engines. */
  def revenueMomChange(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
    // unpartitioned Window = single-partition WindowExec: safe ONLY
    // because `monthly` is calendar-bounded (≤ 12·years rows) — do not
    // copy this shape onto anything that scales with the fact table
    val w = Window.orderBy("o_year", "o_month")
    monthly
      .withColumn("prev", lag("rev", 1).over(w))
      .select(col("o_year"), col("o_month"),
        expr("CAST(rev AS DOUBLE)").as("revenue"),
        expr("""CAST(CAST(
          (CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE)
          AS DECIMAL(18,8)) AS DOUBLE)""").as("mom_change"))
      .orderBy("o_year", "o_month")
  }

  val revenueMomChangeSql: String =
    """WITH m AS (
      |  SELECT extract(year FROM o_orderdate) AS o_year,
      |    extract(month FROM o_orderdate) AS o_month,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1, 2),
      |l AS (SELECT *, lag(rev) OVER (ORDER BY o_year, o_month) AS prev FROM m)
      |SELECT o_year, o_month, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(CAST(
      |    (CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE)
      |    AS DECIMAL(18,8)) AS DOUBLE) AS mom_change
      |FROM l ORDER BY 1, 2""".stripMargin

  /** Moment statistics per event_type: mean and sample stddev of
    * `value`, computed from decimal-exact sums (Σx, Σx²) so the result
    * is partition-order independent — `stddev_samp` over raw doubles
    * is not reproducible across runs/engines, the two-sums formulation
    * is (both engines evaluate the identical double expression over
    * identical decimal-derived operands). Shuffles only (type, n, Σx,
    * Σx²) per group — the map-side partial aggregate carries three
    * numbers regardless of input scale. */
  def valueStatsByType(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr(s"$SumValue").as("s1"),
        expr(s"$SumValueSq").as("s2"))
      // degenerate-group guards, engine-divergence-proof: DuckDB maps
      // double x/0 to NULL (Spark: NaN/Inf) and ERRORS on sqrt(<0)
      // (Spark: NaN) — so singleton groups emit NULL stddev on both
      // engines, and FP cancellation can never push the variance
      // argument negative (greatest(0, ·) is the identity whenever the
      // true variance is positive, so non-degenerate values are
      // bit-identical to the unguarded form)
      .select(col("event_type"), col("n"),
        expr("s1 / CAST(n AS DOUBLE)").as("mean_value"),
        expr("""CASE WHEN n > 1 THEN
               |  sqrt(greatest(CAST(0 AS DOUBLE),
               |    s2 - (s1 * s1) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
               |ELSE NULL END""".stripMargin).as("stddev_value"))
      .orderBy("event_type")

  val valueStatsByTypeSql: String =
    s"""WITH g AS (
       |  SELECT event_type, count(*) AS n,
       |    $SumValue AS s1,
       |    $SumValueSq AS s2
       |  FROM events GROUP BY 1)
       |SELECT event_type, n,
       |  s1 / CAST(n AS DOUBLE) AS mean_value,
       |  CASE WHEN n > 1 THEN
       |    sqrt(greatest(CAST(0 AS DOUBLE),
       |      s2 - (s1 * s1) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
       |  ELSE NULL END AS stddev_value
       |FROM g ORDER BY event_type""".stripMargin
  /** Winsorized moments per event type: clip values at the exact
    * per-group p01/p99, then mean/stddev from decimal two-sums — the
    * outlier-robust normalization stat a feature pipeline computes
    * before scaling. The bounds come from EXACT interpolated
    * percentiles (one per-group sort at this stage; the approx sketch
    * twin of that trade lives in `value_percentiles_approx`), each
    * quantized through DECIMAL(18,6) so both engines clip against
    * bit-identical bounds; the clipped stream then reuses the
    * [[valueStatsByType]] two-sums formulation. Bounds are a 5-row
    * frame → broadcast join, never a shuffle of events. */
  def valueWinsorized(events: DataFrame): DataFrame = {
    val bounds = events.groupBy("event_type")
      .agg(
        expr("CAST(CAST(percentile(value, 0.01) AS DECIMAL(18,6)) AS DOUBLE)")
          .as("lo"),
        expr("CAST(CAST(percentile(value, 0.99) AS DECIMAL(18,6)) AS DOUBLE)")
          .as("hi"))
    events.join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("lo"), col("hi"),
        least(greatest(col("value"), col("lo")), col("hi")).as("v"))
      .groupBy("event_type")
      .agg(first("lo").as("lo"), first("hi").as("hi"),
        count(lit(1)).as("n"),
        expr("CAST(sum(CAST(v AS DECIMAL(20,6))) AS DOUBLE)").as("s1"),
        // wide integer part: v is bounded only by the p99 bound, which
        // interpolates toward outliers when groups are small
        expr("CAST(sum(CAST(v * v AS DECIMAL(30,6))) AS DOUBLE)").as("s2"))
      // same degenerate-group guards as [[valueStatsByType]]
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        expr("CAST(CAST(s1 / CAST(n AS DOUBLE) AS DECIMAL(18,9)) AS DOUBLE)")
          .as("win_mean"),
        expr("""CASE WHEN n > 1 THEN
               |  CAST(CAST(sqrt(greatest(CAST(0 AS DOUBLE),
               |    s2 - (s1 * s1) / CAST(n AS DOUBLE)) /
               |  (CAST(n AS DOUBLE) - 1)) AS DECIMAL(18,9)) AS DOUBLE)
               |ELSE NULL END""".stripMargin).as("win_stddev"))
      .orderBy("event_type")
  }

  val valueWinsorizedSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(CAST(quantile_cont(value, 0.01) AS DECIMAL(18,6)) AS DOUBLE) AS lo,
      |    CAST(CAST(quantile_cont(value, 0.99) AS DECIMAL(18,6)) AS DOUBLE) AS hi
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT e.event_type, b.lo, b.hi,
      |    least(greatest(e.value, b.lo), b.hi) AS v
      |  FROM events e JOIN b USING (event_type)),
      |s AS (
      |  SELECT event_type, any_value(lo) AS lo, any_value(hi) AS hi,
      |    count(*) AS n,
      |    CAST(sum(CAST(v AS DECIMAL(20,6))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(v * v AS DECIMAL(30,6))) AS DOUBLE) AS s2
      |  FROM c GROUP BY 1)
      |SELECT event_type, n, lo, hi,
      |  CAST(CAST(s1 / CAST(n AS DOUBLE) AS DECIMAL(18,9)) AS DOUBLE) AS win_mean,
      |  CASE WHEN n > 1 THEN
      |    CAST(CAST(sqrt(greatest(CAST(0 AS DOUBLE),
      |      s2 - (s1 * s1) / CAST(n AS DOUBLE)) /
      |    (CAST(n AS DOUBLE) - 1)) AS DECIMAL(18,9)) AS DOUBLE)
      |  ELSE NULL END AS win_stddev
      |FROM s ORDER BY event_type""".stripMargin

  /** Forward fill (last observation carried forward): per user, the
    * most recent purchase value as of each event — the gap-filling
    * primitive for sparse observations in a dense event stream
    * (sensor readings, prices, consent flags). `last(col,
    * ignoreNulls)` over a rows-unbounded-preceding frame; carried
    * values are copied verbatim (no arithmetic), so doubles stay
    * bit-identical to the oracle. Runs in one shuffle on user_id. */
  def forwardFill(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "purchase", col("value")).as("obs"))
      .withColumn("last_purchase_value",
        last(col("obs"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("last_purchase_value"))
      .orderBy("user_id", "event_id")
  }

  val forwardFillSql: String =
    """SELECT user_id, event_id,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END
      |    IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS last_purchase_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Peak activity burst per user: the maximum number of events any
    * rolling 10-minute window (time-based RANGE frame, not a row
    * count) contains — the rate-limit / bot-detection shape the
    * reference's fixed minute buckets cannot express (a burst striding
    * a minute boundary splits across two buckets). The frame orders by
    * epoch seconds: Spark's `rangeBetween` takes numeric offsets, and
    * a timestamp→long cast floors identically in DuckDB via
    * `floor(epoch(ts))`. Peers (equal seconds) are frame-included in
    * both engines. */
  def userPeakBurst(events: DataFrame, windowSec: Int = 600): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_s"))
      .rangeBetween(-windowSec, 0)
    events
      .select(col("user_id"), col("ts").cast("long").as("ts_s"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(max("burst").as("peak_burst"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  def userPeakBurstSql(windowSec: Int = 600): String =
    s"""WITH b AS (
       |  SELECT user_id, count(*) OVER (PARTITION BY user_id
       |    ORDER BY floor(epoch(ts))::BIGINT
       |    RANGE BETWEEN $windowSec PRECEDING AND CURRENT ROW) AS burst
       |  FROM events)
       |SELECT user_id, max(burst) AS peak_burst, count(*) AS n_events
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Markov transition counts over the event-type sequence: per user
    * (ordered by event time, event_id tiebreak) pair each event with
    * its predecessor and count (prev, next) bigrams — the
    * session-model / next-event-prediction feature. One shuffle for the
    * lag window; the bigram rollup is a 25-row hash aggregate with
    * map-side partials. Ordering is total (event_id unique), so the
    * bigram multiset is deterministic. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("prev_type", "next_type")
  }

  val eventTransitionsSql: String =
    """WITH s AS (SELECT user_id, event_type,
      |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events)
      |SELECT prev AS prev_type, event_type AS next_type,
      |  count(*) AS n_transitions
      |FROM s WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Strictly-ordered funnel: users who viewed, then clicked AFTER
    * their first view, then purchased AFTER that first qualifying
    * click. Each stage is a conditional-min aggregate per user; stage
    * n+1 re-aggregates the events joined against stage n's timestamps.
    * All three aggregates and both joins cluster on user_id — Spark
    * reuses one hash partitioning end-to-end (no re-shuffle of events
    * between stages), and the stage tables (≤1 row per user) broadcast
    * on a real cluster. min() is order-insensitive, so no tiebreaks
    * are needed anywhere. */
  def orderedFunnel(events: DataFrame): DataFrame = {
    val e = events.select("user_id", "event_type", "ts")
    val s1 = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = e.join(s1, "user_id")
      .where(col("event_type") === "click" && col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = e.join(s2, "user_id")
      .where(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage("1_view", s1)
      .unionByName(stage("2_click_after_view", s2))
      .unionByName(stage("3_purchase_after_click", s3))
      .orderBy("stage")
  }

  val orderedFunnelSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT '1_view' AS stage, count(*) AS n_users FROM s1
      |UNION ALL SELECT '2_click_after_view', count(*) FROM s2
      |UNION ALL SELECT '3_purchase_after_click', count(*) FROM s3
      |ORDER BY stage""".stripMargin

  /** Pearson correlation and OLS slope of quantity vs extended price
    * per return flag, computed FROM EXACT DECIMAL SUMS (n, Σx, Σy,
    * Σx², Σy², Σxy) rather than a streaming double `corr()` — the sums
    * are order-independent (hash-exact vs the oracle) and the closed
    * form is a deterministic scalar epilogue on the 3-row result. At
    * scale this is one map-side-combined pass; the built-in corr()
    * co-moment buffer has the same shape but a partition-order-
    * dependent floating accumulation. */
  def qtyPriceCorrelation(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("sum(CAST(l_quantity AS DECIMAL(18,2)))").as("sx"),
        expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)))").as("sy"),
        expr("sum(CAST(l_quantity * l_quantity AS DECIMAL(20,4)))").as("sxx"),
        expr("sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4)))").as("syy"),
        expr("sum(CAST(l_quantity * l_extendedprice AS DECIMAL(22,4)))").as("sxy"))
      // 1e-12 quantization: the engines' DECIMAL->DOUBLE casts can
      // differ by 1 ulp (~4e-18 here), which a raw double compare
      // trips on; 12 decimals sit 5 orders above that noise floor.
      // Zero-variance guards: a constant column makes the denominator
      // 0 (or, by FP cancellation, epsilon-negative) — Spark would
      // emit NaN where DuckDB NULLs double x/0 and ERRORS on
      // sqrt(<0), so both engines take the same NULL branch instead;
      // non-degenerate values are untouched (the guard condition
      // evaluates on identical doubles in both engines)
      .select(col("l_returnflag"), col("n"),
        expr("""CASE WHEN
               |  (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 AND
               |  (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
               |THEN CAST(CAST(
               |(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               |(sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               | sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               |AS DECIMAL(18,12)) AS DOUBLE) ELSE NULL END"""
          .stripMargin).as("corr_qty_price"),
        expr("""CASE WHEN
               |  (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
               |THEN CAST(CAST(
               |(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               |(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |AS DECIMAL(18,12)) AS DOUBLE) ELSE NULL END"""
          .stripMargin).as("regr_slope"))
      .orderBy("l_returnflag")

  val qtyPriceCorrelationSql: String =
    """WITH s AS (SELECT l_returnflag, count(*) AS n,
      |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |  sum(CAST(l_quantity * l_quantity AS DECIMAL(20,4))) AS sxx,
      |  sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS syy,
      |  sum(CAST(l_quantity * l_extendedprice AS DECIMAL(22,4))) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n::BIGINT AS n,
      |  CASE WHEN
      |    (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 AND
      |    (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      |  THEN CAST(CAST(
      |  (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |  (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |   sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  AS DECIMAL(18,12)) AS DOUBLE) ELSE NULL END AS corr_qty_price,
      |  CASE WHEN
      |    (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      |  THEN CAST(CAST(
      |  (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |  (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  AS DECIMAL(18,12)) AS DOUBLE) ELSE NULL END AS regr_slope
      |FROM s ORDER BY 1""".stripMargin

  /** Fixed-width histogram of event values: bin = floor(value /
    * width). Purely expression-level binning (no join against a bin
    * dim), one map-side-combined aggregate; the floor(double/const) is
    * the same IEEE op on both engines so bin assignment is exact. */
  def valueHistogram(events: DataFrame, width: Int = 50): DataFrame =
    events
      .groupBy(expr(s"CAST(floor(value / $width) AS BIGINT)").as("bin"))
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .select((col("bin") * width).as("bin_start"), col("n_events"),
        col("sum_value"))
      .orderBy("bin_start")

  def valueHistogramSql(width: Int = 50): String =
    s"""SELECT (CAST(floor(value / $width) AS BIGINT) * $width) AS bin_start,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shannon entropy (nats) of each experiment's event-type mix, from
    * EXACT counts: entropy = ln(total) − Σ c·ln(c) / total. The per-row
    * `c·ln(c)` doubles are cast to DECIMAL(28,12) BEFORE summing so the
    * sum is order-independent (a raw double Σ would vary with partition
    * order); a 1-ulp `ln` divergence between engines sits ~4 orders of
    * magnitude below the 12-decimal quantization. Two aggregates, both
    * clustered on experiment_id → one shuffle after the count rollup. */
  def experimentEntropy(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").as("experiment_id"),
        col("event_type"))
      .groupBy("experiment_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .groupBy("experiment_id")
      .agg(sum("c").as("total"),
        expr("sum(CAST(c * ln(c) AS DECIMAL(28,12)))").as("s"))
      .select(col("experiment_id"), col("total"),
        expr("CAST(CAST(ln(total) - CAST(s AS DOUBLE) / total AS DECIMAL(18,9)) AS DOUBLE)")
          .as("entropy_nats"))
      // explicit null placement: DuckDB defaults ASC to NULLS LAST,
      // Spark to NULLS FIRST — a null experiment_id (props without $.k)
      // must land at the same end in both engines
      .orderBy(asc_nulls_last("experiment_id"))

  val experimentEntropySql: String =
    """WITH c AS (SELECT json_extract_string(props, '$.k') AS experiment_id,
      |  event_type, count(*) AS c FROM events GROUP BY 1, 2),
      |t AS (SELECT experiment_id, sum(c)::BIGINT AS total,
      |  sum(CAST(c * ln(c) AS DECIMAL(28,12))) AS s
      |  FROM c GROUP BY 1)
      |SELECT experiment_id, total,
      |  CAST(CAST(ln(total) - CAST(s AS DOUBLE) / total AS DECIMAL(18,9)) AS DOUBLE)
      |    AS entropy_nats
      |FROM t ORDER BY 1""".stripMargin

  /** Exact mode (most frequent value) per group, deterministic ties →
    * lexicographically smallest value. The SCALABLE mode formulation:
    * the count rollup shrinks the stream to |groups × distinct values|
    * BEFORE any ranking, and the row_number window partitions by group
    * (no global sort) — versus a naive mode() aggregate that would hold
    * per-group value maps in aggregation state. Both steps cluster on
    * experiment_id, so the whole query is the count shuffle plus a
    * proportionally tiny window pass. */
  def modalEventType(events: DataFrame): DataFrame = {
    val counts = events
      .select(get_json_object(col("props"), "$.k").as("experiment_id"),
        col("event_type"))
      .where(col("experiment_id").isNotNull)
      .groupBy("experiment_id", "event_type")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("experiment_id")
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("experiment_id"),
        col("event_type").as("modal_event_type"), col("n").as("n_events"))
      .orderBy("experiment_id")
  }

  val modalEventTypeSql: String =
    """WITH c AS (SELECT json_extract_string(props, '$.k') AS experiment_id,
      |  event_type, count(*) AS n FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY experiment_id
      |        ORDER BY n DESC, event_type) AS rn FROM c)
      |SELECT experiment_id, event_type AS modal_event_type,
      |  n AS n_events
      |FROM r WHERE rn = 1 ORDER BY experiment_id""".stripMargin

  /** Trailing z-score anomaly detection over the per-minute visit
    * series — the ops-side diagnostic a metrics pipeline layers on the
    * reference's visit counters (flag a minute whose traffic deviates
    * from its own recent history). The trailing moments come from
    * EXACT integer window sums (`Σv`, `Σv²` over the `lookback`
    * preceding minutes — never an engine's own stddev kernel, whose
    * accumulation order is not cross-engine-reproducible), the
    * degenerate-window guard `n·Σv² − (Σv)² > 0` is integer-exact, and
    * the one float expression `(v − μ)/σ` runs on identical doubles in
    * both engines, quantized to DECIMAL(18,9). NULL z for minutes with
    * fewer than `minN` trailing observations or zero variance.
    * One minute-keyed aggregate + one ordered window: two shuffles.
    * The unpartitioned window runs on the AGGREGATE series (one row
    * per minute — ~526k rows/year), never on raw events; if the series
    * itself outgrew a task, range-partition by day and stitch the
    * `lookback`-row boundary like [[ntileByRange]] stitches offsets. */
  def visitsZscore(events: DataFrame, lookback: Int = 10,
      minN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perMin = events
      .groupBy(date_format(date_trunc("minute", col("ts")),
        "yyyy_MM_dd'T'HH_mm").as("minute_key"))
      .agg(count(lit(1)).as("visits"))
    val w = Window.orderBy(col("minute_key"))
      .rowsBetween(-lookback, -1)
    perMin
      .withColumn("n", count(col("visits")).over(w))
      .withColumn("s1", sum(col("visits")).over(w))
      .withColumn("s2", sum(col("visits") * col("visits")).over(w))
      .select(col("minute_key"), col("visits"),
        when(col("n") >= minN &&
            col("n") * col("s2") - col("s1") * col("s1") > 0,
          expr("""CAST(CAST(
            |  (CAST(visits AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
            |  / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            |          / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
            | AS DECIMAL(18,9)) AS DOUBLE)""".stripMargin))
          .as("z"))
      .orderBy("minute_key")
  }

  /** Exponentially-weighted moving average of the per-minute visit
    * series — the smoothing twin of [[visitsZscore]]'s spike detector
    * (dashboards overlay both; `alpha` defaults to the dyadic 1/4 so
    * the multiply is exact scaling). The recurrence
    * `s_t = s_{t-1} + α(x_t − s_{t-1})` is inherently sequential, but
    * it runs over the AGGREGATED minute series — calendar-bounded
    * (525 600 rows/year), never event-proportional — so after the one
    * distributed minute count the whole series folds in a single
    * `aggregate` over a collected array (the same bounded-series
    * budget [[visitsZscore]]'s global window already spends). Bit
    * exactness needs no lattice: both engines execute the identical
    * IEEE op sequence in the identical order (Spark: left fold;
    * DuckDB: recursive CTE stepping rn + 1), and each op is correctly
    * rounded, so every intermediate double matches. */
  def visitsEwma(events: DataFrame, alpha: Double = 0.25,
      windowMinutes: Int = 1440): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // The recurrence is inherently serial (each ewma depends on the
    // previous), and the face is the dashboard-read idiom: smooth the
    // TRAILING WINDOW of closed minutes (default one day), not the
    // full history — with α=0.25 the recurrence forgets past ~20
    // steps anyway, and the bound is what keeps BOTH engines O(window)
    // at any corpus scale (the full-history recursion is quadratic in
    // DuckDB and was 39k sequential steps at sf0.1). The per-minute
    // count is fully distributed; the sequential stage is one O(window)
    // iterator pass on a single task with O(1) state, preserving the
    // exact IEEE op order of the reference recurrence. (An in-plan
    // `aggregate`+`array_append` fold is O(n²) in array copies —
    // measured 65 s at sf0.1; a partition-parallel formulation would
    // re-associate into powers of (1-α) and break bit-exactness.)
    // localCheckpoint: pm feeds BOTH the 1-row max subtree and the
    // probe side of the crossJoin — the DataFrame API does not dedupe
    // common subplans, so without it the corpus-sized scan+aggregate
    // would run twice (the sourceOverlap discipline; pm itself is
    // calendar-bounded, one row per minute).
    val pm = events
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("visits"))
      .localCheckpoint()
    val mx = pm.agg(max(col("m")).as("mx"))
    pm.crossJoin(broadcast(mx))
      .where(col("m") >= expr(s"mx - INTERVAL ${windowMinutes - 1} MINUTES"))
      .select(date_format(col("m"), "yyyy_MM_dd'T'HH_mm").as("minute_key"),
        col("visits"))
      .as[(String, Long)]
      .repartition(1)
      .sortWithinPartitions("minute_key")
      .mapPartitions { it =>
        var prev = 0.0
        var first = true
        it.map { case (mk, v) =>
          val e =
            if (first) { first = false; v.toDouble }
            else prev + alpha * (v.toDouble - prev)
          prev = e
          (mk, v, e)
        }
      }
      .toDF("minute_key", "visits", "ewma")
      .orderBy("minute_key")
  }

  /** Oracle for [[visitsEwma]]: the same recurrence as a recursive
    * CTE stepping one minute at a time over the same trailing window —
    * the sequential order is the exactness contract, so no lattice
    * quantization is needed, and the window bound keeps the recursion
    * O(window) at any scale. */
  def visitsEwmaSql(alpha: Double = 0.25, windowMinutes: Int = 1440): String =
    s"""WITH RECURSIVE pm AS (
       |  SELECT date_trunc('minute', ts) AS m, count(*) AS visits
       |  FROM events GROUP BY 1),
       |mx AS (SELECT max(m) AS mx FROM pm),
       |rn AS (
       |  SELECT strftime(m, '%Y_%m_%dT%H_%M') AS minute_key, visits,
       |    row_number() OVER (ORDER BY m) AS rn
       |  FROM pm, mx
       |  WHERE m >= mx - INTERVAL ${windowMinutes - 1} MINUTE),
       |f AS (
       |  SELECT rn, minute_key, visits, CAST(visits AS DOUBLE) AS ewma
       |  FROM rn WHERE rn = 1
       |  UNION ALL
       |  SELECT r.rn, r.minute_key, r.visits,
       |    f.ewma + $alpha * (CAST(r.visits AS DOUBLE) - f.ewma)
       |  FROM f JOIN rn r ON r.rn = f.rn + 1)
       |SELECT minute_key, visits, ewma FROM f
       |ORDER BY minute_key""".stripMargin

  /** Weighted PageRank (Brin & Page 1998) by distributed power
    * iteration over an edge list `(src, dst, w)` — the canonical
    * iterative-graph shape on Spark: rank state is a node-keyed
    * DataFrame, one iteration = one edge⋈rank join + one dst-keyed
    * aggregate, and lineage is cut per iteration with
    * `localCheckpoint` (an unbounded iterative plan otherwise
    * re-derives every previous round). Dangling mass (nodes with no
    * out-edges) is redistributed uniformly; the per-iteration dangling
    * sum is the only driver-side value and it is ONE double — model-
    * sized state, like [[graft.operators.Similarity.kmeansFit]]'s
    * centroids. With `tol > 0` the loop stops once the L1 delta
    * between rounds falls below it (the delta scan runs over two
    * already-materialized node frames — one cheap job that typically
    * saves several full iterations). Returns `(node, pr)`, Σpr = 1 up
    * to float error. */
  def pagerank(edges: DataFrame, iters: Int = 10,
      damping: Double = 0.85, tol: Double = 0.0): DataFrame = {
    // out-weight folds into the edge frame ONCE (the per-round plan
    // used to re-derive the outW aggregate and join it every round —
    // two of the four per-round joins were loop-invariant)
    val e0 = edges.toDF("src", "dst", "w")
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w")).as("w"))
    val eo = e0
      .join(e0.groupBy(col("src")).agg(sum(col("w")).as("ow")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dangling-ness is a STATIC node property: flag it once on the
    // node frame so the per-round dangling mass is a scan-side
    // filter+sum over pr — no anti-join in the loop
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .join(eo.select(col("src").as("node")).distinct()
        .withColumn("has_out", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = nodes.count().toDouble
      var pr = nodes.withColumn("pr", lit(1.0 / n))
      var converged = false
      for (_ <- 0 until iters if !converged) {
        val prev = pr
        val contrib = eo
          .join(pr.select(col("node").as("src"), col("pr")), "src")
          .select(col("dst").as("node"),
            (col("pr") * col("w") / col("ow")).as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("c"))
        // dangling mass stays IN the plan as a broadcast single-row
        // aggregate — a driver-side .head here would be a second
        // action re-deriving pr's lineage every round
        val dang = pr.where(!col("has_out"))
          .agg(coalesce(sum(col("pr")), lit(0d)).as("dm"))
        pr = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"), col("has_out"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("c"), lit(0d)) + col("dm") / n))
              .as("pr"))
          // one materialization per round (pr feeds BOTH next-round
          // consumers); unbounded lineage would re-derive every
          // previous round instead
          .localCheckpoint()
        if (tol > 0) {
          val delta = prev.withColumnRenamed("pr", "p0")
            .select(col("node"), col("p0"))
            .join(pr, Seq("node"))
            .agg(sum(abs(col("pr") - col("p0")))).head.getDouble(0)
          converged = delta < tol
        }
      }
      pr.select(col("node"), col("pr"))
    } finally { eo.unpersist(); nodes.unpersist() }
  }

  /** Fixed-point mass unit for [[pagerankExact]]: ranks are integer
    * "micro-mass" counts out of 10^15. */
  val PrScale: Long = 1000000000000000L

  /** PageRank by power iteration in FIXED-POINT INTEGER arithmetic:
    * same plan shape as [[pagerank]] (edge⋈rank join, dst-keyed
    * aggregate, broadcast dangling mass, per-round `localCheckpoint`),
    * but rank mass is an integer number of `1/PrScale` units and every
    * division is an integer floor-division. Integer adds are exact and
    * associative, so — unlike a double `sum()`, whose value depends on
    * Spark's partition-merge order — the result is BIT-EXACT across
    * engines and across any partitioning, which is what lets the
    * `word_pagerank` face carry a DuckDB oracle (an unrolled CTE chain
    * replaying the same integer ops; see
    * `TextAnalysis.wordPagerankSql`). Floor losses are ≤ 1 unit
    * (10^-15 of total mass) per divide, so Σpr still ≈ 1 to ~1e-9 and
    * ranking quality is unaffected.
    *
    * `edges` is `(src, dst, w: long)`; damping is the rational
    * `dampNum / dampDen` (integer arithmetic needs a ratio, not a
    * double). Returns `(node, pr_i: long)`. */
  def pagerankExact(edges: DataFrame, iters: Int = 10,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    // loop-invariant work hoisted exactly as in [[pagerank]]: the
    // out-weight joins into the edge frame once, dangling-ness flags
    // the node frame once — the per-round plan is ONE edge⋈rank join,
    // one dst aggregate, one scan-side dangling sum, one node join
    val e0 = edges.toDF("src", "dst", "w")
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w")).as("w"))
    val eo = e0
      .join(e0.groupBy(col("src")).agg(sum(col("w")).as("ow")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .join(eo.select(col("src").as("node")).distinct()
        .withColumn("has_out", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // MEASURED REJECTION (r19, the verdict's item 5): disabling AQE
    // for the iteration body only — fixed shuffle partitions for the
    // bounded node table — cut the per-round job count as predicted
    // (80 → 49 jobs) but REGRESSED wall 6.9–7.3 → 8.3–9.0 s warm and
    // summed task time 80–86 → 98–105 s at sf0.1/local[32]: the jobs
    // saved were cheap orchestration, while static planning lost
    // AQE's runtime small-side broadcast conversion inside the
    // edge⋈rank join (extra sort-merge work every round). AQE stays
    // on; the cadence-change rejection (r18) still holds too.
    try {
      val n = nodes.count()
      require(n > 0, "empty graph")
      // (1 - d)/n in scale units; dampDen divides PrScale so the
      // inner floor loses nothing
      val base = (dampDen - dampNum) * (PrScale / dampDen) / n
      var pr = nodes.withColumn("pr_i", lit(PrScale / n))
      for (_ <- 0 until iters) {
        // per-edge share: (pr_i * w) div ow — the product is done in
        // DECIMAL(38,0) (pr_i·w can pass 2^63); the integral divide
        // lands back in a long ≤ PrScale
        val contrib = eo
          .join(pr.select(col("node").as("src"), col("pr_i")), "src")
          .select(col("dst").as("node"),
            expr("(CAST(pr_i AS DECIMAL(38,0)) * w) div ow").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("c"))
        // dangling mass stays IN the plan as a broadcast single-row
        // aggregate, exactly like [[pagerank]]
        val dang = pr.where(!col("has_out"))
          .agg(coalesce(sum(col("pr_i")), lit(0L)).as("dm"))
        pr = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"), col("has_out"),
            expr(s"$base + ($dampNum * (coalesce(c, 0) + dm div $n))" +
              s" div $dampDen").as("pr_i"))
          // one EAGER materialization per round, deliberately: pr
          // feeds BOTH next-round consumers (contrib and dang), so the
          // plan doubles per round without truncation — and the
          // r18-measured alternative (lazy persist between K-round
          // checkpoints, to keep partitioning metadata and save the
          // per-round job) REGRESSED 8.4 → 10.1 s warm / 109 → 132 s
          // summed task time at sf0.1: concurrent AQE stage futures
          // race the unmaterialized InMemoryRelations and recompute
          // superseded rounds (the NND 4^r failure class). Per-round
          // checkpoint keeps every round computed exactly once.
          .localCheckpoint()
      }
      pr.select(col("node"), col("pr_i"))
    } finally { eo.unpersist(); nodes.unpersist() }
  }

  def visitsZscoreSql(lookback: Int = 10, minN: Int = 5): String =
    s"""WITH pm AS (
       |  SELECT strftime(date_trunc('minute', ts), '%Y_%m_%dT%H_%M')
       |      AS minute_key,
       |    count(*) AS visits
       |  FROM events GROUP BY 1),
       |tw AS (
       |  SELECT minute_key, visits,
       |    count(visits) OVER w AS n,
       |    sum(visits) OVER w AS s1,
       |    sum(visits * visits) OVER w AS s2
       |  FROM pm
       |  WINDOW w AS (ORDER BY minute_key
       |    ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING))
       |SELECT minute_key, visits,
       |  CASE WHEN n >= $minN AND n * s2 - s1 * s1 > 0 THEN
       |    CAST(CAST(
       |      (visits::DOUBLE - s1::DOUBLE / n::DOUBLE)
       |      / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE)
       |             / (n - 1)::DOUBLE)
       |     AS DECIMAL(18,9)) AS DOUBLE)
       |  END AS z
       |FROM tw ORDER BY minute_key""".stripMargin

  /** CUSUM change-point detection over the per-minute visit series —
    * the sequential drift detector that catches slow level shifts a
    * pointwise z-score ([[visitsZscore]]) misses (Page 1954 shape; the
    * streaming-monitoring classic). Deviations are scaled to stay in
    * INTEGER arithmetic: with n minutes and `total` visits overall,
    * the textbook slack k = mean/2 (≈0.5σ for Poisson-ish counts —
    * without slack a stationary random walk accumulates unboundedly
    * and every long series alarms) scales to x⁺_i = 2n·v_i − 3·total
    * and x⁻_i = total − 2n·v_i (units: 2n·visits), and each one-sided
    * statistic uses the prefix-extremum identity —
    * S_i = max(0, S_{i−1} + x_i) equals
    * prefix_i − min(0, min_{j≤i} prefix_j) — so the RECURRENCE becomes
    * running-extremum windows instead of a sequential fold. `alarm`
    * fires when either statistic exceeds `2·alarmMult·total`, i.e. the
    * normalized CUSUM S/(2n) exceeds `alarmMult` times the global mean
    * rate — an integer compare, so the flag is engine-exact.
    *
    * Scale shape: one shuffle to the minute grain (key space bounded
    * by the calendar), then ordered windows over the minute SERIES —
    * bounded by minutes-in-time-range, not event volume, the same
    * budget [[visitsZscore]]'s global window already spends (at 100 TB
    * the series for a year is ~526k rows). The (n, total) pair rides
    * in as a 1-row broadcast crossJoin (whitelisted pattern). All
    * outputs are integers except the normalized columns, each ONE
    * IEEE division from integers — hash-exact.
    *
    * Integer headroom (the price of BIGINT exactness): every prefix
    * sum is bounded by |pre| ≤ 3·n_min·total and the clamped
    * statistics by 6·n_min·total, so the BIGINT lattice holds while
    * n_min·total < 2⁶³/6 ≈ 1.5×10¹⁸ — a year of minute keys (~526k)
    * up to ~2.9×10¹² events, or a month (~43.8k) up to ~3.5×10¹³.
    * Past that, coarsen the grain (hour keys divide n_min by 60) or
    * narrow the monitored time range; under ANSI mode an overflow
    * errors rather than wrapping, and DuckDB's silent HUGEINT widening
    * would otherwise break the hash-exact twin contract. The streaming
    * face ([[graft.streaming.StreamingMetrics.startVisitsCusum]])
    * has no such bound — its state folds one minute at a time against
    * a fixed target, never a whole-series prefix. */
  def visitsCusum(events: DataFrame, alarmMult: Int = 4): DataFrame = {
    val perMin = events
      .groupBy(date_format(date_trunc("minute", col("ts")),
        "yyyy_MM_dd'T'HH_mm").as("minute_key"))
      .agg(count(lit(1)).as("visits"))
    val totals = perMin.agg(count(lit(1)).as("n_min"),
      sum(col("visits")).as("total"))
    val wRun = Window.orderBy(col("minute_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perMin.crossJoin(broadcast(totals))
      .withColumn("pre_pos", sum(lit(2L) * col("n_min") * col("visits")
        - lit(3L) * col("total")).over(wRun))
      .withColumn("pre_neg", sum(col("total")
        - lit(2L) * col("n_min") * col("visits")).over(wRun))
      .withColumn("cusum_pos",
        col("pre_pos") - least(lit(0L), min(col("pre_pos")).over(wRun)))
      .withColumn("cusum_neg",
        col("pre_neg") - least(lit(0L), min(col("pre_neg")).over(wRun)))
      .select(col("minute_key"), col("visits"),
        col("cusum_pos"), col("cusum_neg"),
        expr("CAST(cusum_pos AS DOUBLE) / CAST(2 * n_min AS DOUBLE)")
          .as("cusum_pos_visits"),
        expr("CAST(cusum_neg AS DOUBLE) / CAST(2 * n_min AS DOUBLE)")
          .as("cusum_neg_visits"),
        (greatest(col("cusum_pos"), col("cusum_neg")) >
          lit(2L * alarmMult) * col("total")).as("alarm"))
      .orderBy("minute_key")
  }

  /** Oracle for [[visitsCusum]]: the same integer prefix-extremum
    * identity as two DuckDB running windows. */
  def visitsCusumSql(alarmMult: Int = 4): String =
    s"""WITH pm AS (
       |  SELECT strftime(date_trunc('minute', ts), '%Y_%m_%dT%H_%M')
       |      AS minute_key,
       |    count(*) AS visits
       |  FROM events GROUP BY 1),
       |t AS (SELECT count(*) AS n_min, sum(visits) AS total FROM pm),
       |p AS (
       |  SELECT minute_key, visits, t.n_min, t.total,
       |    sum(2 * n_min * visits - 3 * total) OVER w AS pre_pos,
       |    sum(total - 2 * n_min * visits) OVER w AS pre_neg
       |  FROM pm, t
       |  WINDOW w AS (ORDER BY minute_key
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |c AS (
       |  SELECT minute_key, visits, n_min, total,
       |    (pre_pos - least(0, min(pre_pos)
       |      OVER (ORDER BY minute_key
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT
       |      AS cusum_pos,
       |    (pre_neg - least(0, min(pre_neg)
       |      OVER (ORDER BY minute_key
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT
       |      AS cusum_neg
       |  FROM p)
       |SELECT minute_key, visits::BIGINT AS visits, cusum_pos, cusum_neg,
       |  CAST(cusum_pos AS DOUBLE) / CAST(2 * n_min AS DOUBLE)
       |    AS cusum_pos_visits,
       |  CAST(cusum_neg AS DOUBLE) / CAST(2 * n_min AS DOUBLE)
       |    AS cusum_neg_visits,
       |  greatest(cusum_pos, cusum_neg) > 2 * $alarmMult * total AS alarm
       |FROM c ORDER BY minute_key""".stripMargin

  // the A/B arm projection and the min-variant control-pick window,
  // shared by BOTH readouts (variantLift's mean/Welch-t face and
  // variantConversion's proportion/chi-square face) so the experiment
  // extraction and the control-arm rule can never drift between them
  private[graft] def armEvents(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").as("experiment_id"),
        col("event_type").as("variant"), col("value"))
      .where(col("experiment_id").isNotNull)
  private[graft] val ArmControlWindow =
    Window.partitionBy(col("experiment_id"))
      .orderBy(col("variant"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** A/B experiment readout: per (experiment, variant) value moments
    * plus lift and Welch's t versus the experiment's control variant —
    * the statistical-analysis layer the reference's dashboard stops
    * short of (it reports uniques per experiment/variant; the next
    * question every experimenter asks is "did the metric move, and is
    * it noise?"). Control = the alphabetically-first variant within
    * each experiment (the deterministic stand-in for a labeled
    * control arm). Welch rather than pooled-variance t because variant
    * arms have no reason to share a variance.
    *
    * Scale shape: one shuffle to the (experiment, variant) grain —
    * everything downstream operates on the BOUNDED arm table (arms ×
    * experiments, hundreds of rows at any scale), with the control
    * row folded back by ONE per-experiment window pass (first-over-
    * unbounded-frame ordered by variant ≡ the min-variant control
    * pick) — the whole derivation references the arm aggregate exactly
    * once, so events is scanned once and the frame stays LAZY like its
    * sibling operators. Moments
    * ride the [[valueStatsByType]] decimal two-sums (value carries two
    * decimals → DECIMAL sums are exact and order-independent); lift and
    * t are short scalar IEEE chains written verbatim in both engines,
    * with t quantized through DECIMAL(18,9) and the [[valueStatsByType]]
    * degenerate-group guards (NULL when either arm has n ≤ 1 or the
    * variance argument cancels to ≤ 0). */
  def variantLift(events: DataFrame): DataFrame =
    liftFromArms(armEvents(events)
      .groupBy(col("experiment_id"), col("variant"))
      .agg(count(lit(1)).as("n"),
        expr(s"$SumValue").as("s1"),
        expr(s"$SumValueSq").as("s2")))

  /** The derivation TAIL of [[variantLift]] — from a bounded arm table
    * `(experiment_id, variant, n, s1, s2)` (decimal moment sums) to
    * per-arm mean/lift/Welch-t vs the experiment's control arm. Split
    * out so the streaming face
    * ([[graft.streaming.StreamingMetrics.startVariantLiftT]]) replays
    * the IDENTICAL scalar chain per micro-batch over its running arm
    * state: decimal sums are algebraic, so the streamed readout after
    * any batch slicing is bit-equal to the batch face over the same
    * events (asserted in `StreamingSpec`). Input is arm-table-sized
    * (hundreds of rows at any corpus scale); the control arm is folded
    * in by a per-experiment window (first value over the unbounded
    * frame ordered by variant — identical to a min-variant self-join,
    * without the second reference to the input), so the arm aggregate
    * upstream is evaluated exactly once and the frame stays lazy. */
  def liftFromArms(armsIn: DataFrame): DataFrame = {
    val arms = armsIn
      .withColumn("mean_value", expr("s1 / CAST(n AS DOUBLE)"))
      .withColumn("var_value", expr(
        """CASE WHEN n > 1 THEN
          |  greatest(CAST(0 AS DOUBLE),
          |    s2 - (s1 * s1) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
          |END""".stripMargin))
    arms
      .withColumn("control_variant",
        first(col("variant")).over(ArmControlWindow))
      .withColumn("n_ctl", first(col("n")).over(ArmControlWindow))
      .withColumn("mean_ctl",
        first(col("mean_value")).over(ArmControlWindow))
      .withColumn("var_ctl",
        first(col("var_value")).over(ArmControlWindow))
      .select(col("experiment_id"), col("variant"), col("n"),
        col("mean_value"), col("control_variant"), col("mean_ctl"),
        expr("mean_value - mean_ctl").as("lift"),
        expr(WelchTChain).as("t_welch"))
      .orderBy("experiment_id", "variant")
  }

  // the Welch-t scalar chain over the window-folded arm columns,
  // shared verbatim by variantLift, fdrExperiments and the streaming
  // face (variantLiftSql writes the same arithmetic with m./ctl.
  // prefixes over its join formulation — values identical)
  private[graft] val WelchTChain =
    """CASE WHEN variant <> control_variant AND n > 1 AND n_ctl > 1
      |  AND var_value / CAST(n AS DOUBLE)
      |    + var_ctl / CAST(n_ctl AS DOUBLE) > 0 THEN
      |  CAST(CAST(
      |    (mean_value - mean_ctl)
      |    / sqrt(var_value / CAST(n AS DOUBLE)
      |           + var_ctl / CAST(n_ctl AS DOUBLE))
      |  AS DECIMAL(18,9)) AS DOUBLE)
      |END""".stripMargin

  /** A/B conversion-rate readout: per (experiment, variant) conversion
    * counts plus the 2×2 Pearson chi-square versus the experiment's
    * control arm — the PROPORTION-testing sibling of [[variantLift]]'s
    * mean/Welch-t readout (every dashboard reports both; Pearson 1900,
    * the 2×2 form χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))). A
    * "conversion" is value > `threshold` (the model-gate convention
    * shared with pass@k). Control = the alphabetically-first variant
    * per experiment, folded in by the [[liftFromArms]] window pattern.
    *
    * Scale shape: one shuffle to the (experiment, variant) grain with
    * integer counts, then a per-experiment window over the BOUNDED arm
    * table — one scan of events, lazy throughout. The χ² chain is a
    * fixed-order IEEE expression from BIGINT cells, quantized
    * DECIMAL(18,9); NULL for the control row itself and for
    * degenerate margins (a zero row/column total).
    *
    * Output: (experiment_id, variant, n, conv, rate, control_variant,
    * rate_ctl, chi2) ordered by (experiment_id, variant). */
  def variantConversion(events: DataFrame,
      threshold: Double = 100.0): DataFrame = {
    val arms = armEvents(events)
      .groupBy(col("experiment_id"), col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > threshold, 1L).otherwise(0L)).as("conv"))
    arms
      .withColumn("control_variant",
        first(col("variant")).over(ArmControlWindow))
      .withColumn("n_ctl", first(col("n")).over(ArmControlWindow))
      .withColumn("conv_ctl", first(col("conv")).over(ArmControlWindow))
      .select(col("experiment_id"), col("variant"), col("n"), col("conv"),
        expr(ConvRate("conv", "n")).as("rate"),
        col("control_variant"),
        expr(ConvRate("conv_ctl", "n_ctl")).as("rate_ctl"),
        expr(ConvChi2).as("chi2"))
      .orderBy("experiment_id", "variant")
  }

  // conversion-rate scalar chains, shared verbatim with the oracle:
  // a = conv, b = n−conv, c = conv_ctl, d = n_ctl−conv_ctl
  private def ConvRate(c: String, n: String): String =
    s"""CAST(CAST(CAST($c AS DOUBLE) / CAST($n AS DOUBLE)
       |AS DECIMAL(18,9)) AS DOUBLE)""".stripMargin
  private val ConvChi2 =
    """CASE WHEN variant <> control_variant
      |  AND conv + conv_ctl > 0
      |  AND (n - conv) + (n_ctl - conv_ctl) > 0 THEN
      |  CAST(CAST(
      |    CAST(n + n_ctl AS DOUBLE)
      |    * (CAST(conv AS DOUBLE) * CAST(n_ctl - conv_ctl AS DOUBLE)
      |       - CAST(n - conv AS DOUBLE) * CAST(conv_ctl AS DOUBLE))
      |    * (CAST(conv AS DOUBLE) * CAST(n_ctl - conv_ctl AS DOUBLE)
      |       - CAST(n - conv AS DOUBLE) * CAST(conv_ctl AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(n_ctl AS DOUBLE)
      |       * CAST(conv + conv_ctl AS DOUBLE)
      |       * CAST((n - conv) + (n_ctl - conv_ctl) AS DOUBLE))
      |  AS DECIMAL(18,9)) AS DOUBLE)
      |END""".stripMargin

  /** DuckDB replay of [[variantConversion]]: identical counts, window
    * control fold, and χ² chain. */
  def variantConversionSql(threshold: Double = 100.0): String =
    s"""WITH arms AS (
       |  SELECT json_extract_string(props, '$$.k') AS experiment_id,
       |    event_type AS variant, count(*)::BIGINT AS n,
       |    CAST(sum(CASE WHEN value > $threshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conv
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |f AS (
       |  SELECT experiment_id, variant, n, conv,
       |    first_value(variant) OVER w AS control_variant,
       |    first_value(n) OVER w AS n_ctl,
       |    first_value(conv) OVER w AS conv_ctl
       |  FROM arms
       |  WINDOW w AS (PARTITION BY experiment_id ORDER BY variant
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       |SELECT experiment_id, variant, n, conv,
       |  ${ConvRate("conv", "n")} AS rate,
       |  control_variant,
       |  ${ConvRate("conv_ctl", "n_ctl")} AS rate_ctl,
       |  $ConvChi2 AS chi2
       |FROM f ORDER BY experiment_id, variant""".stripMargin

  /** Wald SPRT sequential monitor over the per-minute conversion
    * series — the always-valid sequential test the CUSUM family's
    * level-shift detectors pair with (Wald, "Sequential tests of
    * statistical hypotheses", 1945): the cumulative log-likelihood
    * ratio for H₁: rate = p1 against H₀: rate = p0, with the classic
    * decision bounds ln((1−β)/α) and ln(β/(1−α)). Conversions are
    * value > `threshold` (the [[variantConversion]] signal); LLR_t =
    * c_t·ln(p1/p0) + (n_t−c_t)·ln((1−p1)/(1−p0)) over cumulative
    * counts.
    *
    * Scale shape: one shuffle to the minute grain (calendar-bounded),
    * then running-sum windows over the minute SERIES — the
    * [[visitsCusum]] budget. The two ln factors are computed ONCE as
    * quantized DECIMAL(18,9) scalars inside the expression (engines
    * agree on the quantized constant), and the LLR is two
    * integer×constant products and one subtraction, quantized — so
    * the whole trajectory is hash-exact. The streaming face
    * ([[graft.streaming.StreamingMetrics.startSprtConversion]]) folds
    * the identical chain over running totals.
    *
    * Output per minute: (minute_key, n, conv, n_cum, conv_cum, llr,
    * decision ∈ {accept_h1, accept_h0, continue}). */
  def sprtConversion(events: DataFrame, threshold: Double = 100.0,
      p0: Double = 0.10, p1: Double = 0.15,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    val perMin = events
      .groupBy(date_format(date_trunc("minute", col("ts")),
        "yyyy_MM_dd'T'HH_mm").as("minute_key"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > threshold, 1L).otherwise(0L)).as("conv"))
    val wRun = Window.orderBy(col("minute_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perMin
      .withColumn("n_cum", sum(col("n")).over(wRun))
      .withColumn("conv_cum", sum(col("conv")).over(wRun))
      .withColumn("llr", expr(sprtLlrExpr(p0, p1)))
      .select(col("minute_key"), col("n"), col("conv"),
        col("n_cum"), col("conv_cum"), col("llr"),
        expr(sprtDecisionExpr(alpha, beta)).as("decision"))
      .orderBy("minute_key")
  }

  // the LLR and decision chains, shared verbatim with the oracle and
  // the streaming face; the ln factors quantize to engine-agreeing
  // constants before the integer products
  // every literal ratio divides as DOUBLE: decimal-literal division
  // rounds to engine-specific quotient scales (Spark and DuckDB
  // disagree), while double division of the same two doubles is
  // IEEE-identical everywhere
  private[graft] def sprtLlrExpr(p0: Double, p1: Double): String =
    s"""CAST(CAST(
       |  CAST(conv_cum AS DOUBLE)
       |    * CAST(CAST(ln(CAST($p1 AS DOUBLE) / CAST($p0 AS DOUBLE))
       |        AS DECIMAL(18,9)) AS DOUBLE)
       |  + CAST(n_cum - conv_cum AS DOUBLE)
       |    * CAST(CAST(ln(CAST(1.0 - $p1 AS DOUBLE)
       |        / CAST(1.0 - $p0 AS DOUBLE)) AS DECIMAL(18,9))
       |        AS DOUBLE)
       |AS DECIMAL(18,9)) AS DOUBLE)""".stripMargin
  private[graft] def sprtDecisionExpr(alpha: Double,
      beta: Double): String =
    s"""CASE
       |  WHEN llr >= CAST(CAST(ln(CAST(1.0 - $beta AS DOUBLE)
       |    / CAST($alpha AS DOUBLE))
       |    AS DECIMAL(18,9)) AS DOUBLE) THEN 'accept_h1'
       |  WHEN llr <= CAST(CAST(ln(CAST($beta AS DOUBLE)
       |    / CAST(1.0 - $alpha AS DOUBLE))
       |    AS DECIMAL(18,9)) AS DOUBLE) THEN 'accept_h0'
       |  ELSE 'continue'
       |END""".stripMargin

  /** DuckDB replay of [[sprtConversion]]: identical minute rollup,
    * running sums, and quantized LLR/decision chains. */
  def sprtConversionSql(threshold: Double = 100.0, p0: Double = 0.10,
      p1: Double = 0.15, alpha: Double = 0.05,
      beta: Double = 0.05): String =
    s"""WITH pm AS (
       |  SELECT strftime(date_trunc('minute', ts), '%Y_%m_%dT%H_%M')
       |      AS minute_key,
       |    count(*)::BIGINT AS n,
       |    CAST(sum(CASE WHEN value > $threshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conv
       |  FROM events GROUP BY 1),
       |cum AS (
       |  SELECT minute_key, n, conv,
       |    sum(n) OVER w AS n_cum, sum(conv) OVER w AS conv_cum
       |  FROM pm
       |  WINDOW w AS (ORDER BY minute_key
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |sc AS (
       |  SELECT minute_key, n, conv, n_cum::BIGINT AS n_cum,
       |    conv_cum::BIGINT AS conv_cum,
       |    ${sprtLlrExpr(p0, p1)} AS llr
       |  FROM cum)
       |SELECT minute_key, n, conv, n_cum, conv_cum, llr,
       |  ${sprtDecisionExpr(alpha, beta)} AS decision
       |FROM sc ORDER BY minute_key""".stripMargin

  /** Poisson bootstrap over the value stream: B resample means from
    * hash-drawn Poisson(1) multiplicities — the one-pass bootstrap a
    * distributed engine can actually run (exact multinomial resampling
    * needs the row count up front and a second pass; Poissonization
    * decouples rows, so each row draws its replicate multiplicities
    * independently — Chamandy et al., "Estimating uncertainty for
    * massive data streams", Google 2012; also the Bag of Little
    * Bootstraps' cousin). Each (row, replicate) multiplicity inverts
    * the Poisson(1) CDF at a dyadic md5 uniform — the CDF breakpoints
    * are exact double literals in both engines, so multiplicities are
    * integers and hash-exact.
    *
    * Scale shape: explode ×B at the scan (B=32 — the flatMap a real
    * pipeline fuses into the pass), partial-aggregate per replicate
    * map-side, then ONE B-row shuffle; means ride the
    * [[valueStatsByType]] decimal-sum lattice. Output: one row per
    * replicate (replicate, n_eff, mean_value) — the replicate
    * DISTRIBUTION, from which any CI quantile follows; the full-data
    * mean rides along for centering. */
  def valueBootstrapCi(events: DataFrame, replicates: Int = 32,
      kernel: String = "md5"): DataFrame = {
    val mult = PoissonMult
    events
      .select(col("event_id"), col("value"))
      .where(col("value").isNotNull)
      .select(col("event_id"), col("value"),
        explode(array((0 until replicates).map(lit): _*)).as("replicate"))
      // raw typed key: the md5 branch re-wraps it in CAST(... AS
      // STRING) (draws stay bit-identical to the oracle), while
      // xxhash64 hashes the typed column directly — no string render
      .withColumn("u", expr(bootstrapU(kernel, "event_id", "replicate")))
      .withColumn("m", expr(mult))
      .groupBy(col("replicate"))
      .agg(sum(col("m")).cast("long").as("n_eff"),
        expr("CAST(sum(m * CAST(value AS DECIMAL(18,2))) AS DOUBLE)")
          .as("s1"))
      .select(col("replicate").cast("long").as("replicate"), col("n_eff"),
        expr("CASE WHEN n_eff > 0 THEN s1 / CAST(n_eff AS DOUBLE) END")
          .as("mean_value"))
      .orderBy("replicate")
  }

  /** The bootstrap draw u ∈ (0, 1] over the given key columns —
    * kernel-selectable because the draws DOMINATE the bootstrap's
    * cost at scale (§7.11: ~470M md5 evaluations at the win-rate
    * face's 100× point):
    *
    *  - `"md5"` (default, the catalog faces): dyadic uniform from the
    *    md5 prefix of the ':'-joined string key — the ORACLE-PARITY
    *    kernel (DuckDB ships md5; every draw is bit-identical across
    *    engines, so the resample CIs hash-match).
    *  - `"xxhash64"`: Spark-native codegen'd 64-bit hash taken
    *    DIRECTLY over the typed key columns — no string rendering, no
    *    digest; the flag-gated scale kernel for production runs with
    *    no cross-engine twin (measured §7.13). Statistically
    *    equivalent (either kernel is a deterministic stand-in for
    *    iid uniforms feeding the same Poisson inverse-CDF), but the
    *    draws differ, so CIs differ within bootstrap noise — never
    *    flip the kernel under a pinned face.
    *
    * Both map to (hash mod 2³²  + 1) / 2³², so u = 0 is unreachable
    * and u = 1 folds into the CDF's ELSE arm in both kernels. */
  private[graft] def bootstrapU(kernel: String,
      keys: String*): String = kernel match {
    case "md5" =>
      s"""(CAST(conv(substring(md5(${keys.map(k =>
        s"CAST($k AS STRING)").mkString(" || ':' || ")}),
        |  1, 8), 16, 10) AS BIGINT) + 1)
        |/ CAST(4294967296 AS DOUBLE)""".stripMargin
    case "xxhash64" =>
      s"""(pmod(xxhash64(${keys.mkString(", ")}), 4294967296L) + 1)
        |/ CAST(4294967296 AS DOUBLE)""".stripMargin
    case other => throw new IllegalArgumentException(
      s"unknown bootstrap kernel '$other' (md5 | xxhash64)")
  }

  /** Poisson(1) inverse CDF over a dyadic uniform column `u`, at
    * cumulative breakpoints e⁻¹·Σ 1/k! (k = 0..5; P(X > 5) ≈ 6e-4
    * truncated to 5 — documented bias far below bootstrap noise).
    * Literals are shared verbatim by both engines, so every
    * comparison is exact. Shared by [[valueBootstrapCi]] and the
    * win-rate bootstrap
    * ([[graft.operators.Preference.winrateBootstrapCi]]). */
  private[graft] val PoissonMult =
    """CASE WHEN u < 0.36787944117144233 THEN 0
      |  WHEN u < 0.7357588823428847 THEN 1
      |  WHEN u < 0.9196986029286058 THEN 2
      |  WHEN u < 0.9810118431238462 THEN 3
      |  WHEN u < 0.9963401531726563 THEN 4
      |  ELSE 5 END""".stripMargin

  /** Oracle for [[valueBootstrapCi]]: the same dyadic uniforms, CDF
    * breakpoints, and decimal sums. */
  def valueBootstrapCiSql(replicates: Int = 32): String =
    s"""WITH x AS (
       |  SELECT e.event_id, e.value, t.replicate,
       |    (('0x' || substr(md5(e.event_id::VARCHAR || ':' ||
       |        t.replicate::VARCHAR), 1, 8))::BIGINT + 1)
       |      / CAST(4294967296 AS DOUBLE) AS u
       |  FROM events e, (SELECT unnest(range($replicates)) AS replicate) t
       |  WHERE e.value IS NOT NULL),
       |mlt AS (
       |  SELECT replicate, value,
       |    CASE WHEN u < 0.36787944117144233 THEN 0
       |      WHEN u < 0.7357588823428847 THEN 1
       |      WHEN u < 0.9196986029286058 THEN 2
       |      WHEN u < 0.9810118431238462 THEN 3
       |      WHEN u < 0.9963401531726563 THEN 4
       |      ELSE 5 END AS m
       |  FROM x),
       |g AS (
       |  SELECT replicate, sum(m)::BIGINT AS n_eff,
       |    CAST(sum(m * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1
       |  FROM mlt GROUP BY 1)
       |SELECT replicate::BIGINT AS replicate, n_eff,
       |  CASE WHEN n_eff > 0 THEN s1 / CAST(n_eff AS DOUBLE) END
       |    AS mean_value
       |FROM g ORDER BY replicate""".stripMargin

  /** U-shaped multi-touch attribution: every purchase distributes one
    * unit of credit over the user's touch events (click/view/signup)
    * in the preceding `windowHours` — 40/20/40 position weighting (the
    * industry-standard U-shape: first and last touch carry 0.4 each,
    * the middle splits 0.2; a lone touch takes 1.0, a pair 0.5/0.5) —
    * and the per-CHANNEL credit totals are the marketing readout. The
    * attribution sibling of the as-of join ([[graft.operators.AsOf]]):
    * last-touch is the as-of special case, this spreads the credit.
    *
    * Scale shape: one equi-join on user_id with the time-window
    * predicate riding the join condition (never a cross join), then a
    * window partitioned by purchase_id (bounded: one user's touches in
    * a day), then a channel-bounded aggregate. Exactness: positions
    * and counts are integers; the three credit cases are exact DECIMAL
    * literals or one quantized division (middle credit through
    * DECIMAL(18,6)), and the LAST middle touch takes the quantization
    * residual (0.2 − (n−3)·q) so every purchase's credit sums to
    * EXACTLY one — without the residual, any n_touch whose 0.2/(n−2)
    * is inexact at 6 decimals (n=5, 9, …) drifts the channel totals by
    * ~1e-6 per purchase; credit sums are DECIMAL-exact and rendered as
    * doubles at the edge. */
  def multiTouchAttribution(events: DataFrame,
      windowHours: Int = 24): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val touches = events
      .where(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
    val joined = touches.join(purchases, Seq("user_id"))
      .where(col("t_ts") <= col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr(s"INTERVAL $windowHours HOURS"))
    val w = Window.partitionBy(col("purchase_id"))
    val credit = joined
      .withColumn("pos", row_number().over(
        w.orderBy(col("t_ts"), col("touch_id"))))
      .withColumn("n_touch", count(lit(1)).over(w))
      .withColumn("credit", expr(
        """CASE WHEN n_touch = 1 THEN CAST(1.0 AS DECIMAL(18,6))
          |  WHEN n_touch = 2 THEN CAST(0.5 AS DECIMAL(18,6))
          |  WHEN pos = 1 OR pos = n_touch THEN CAST(0.4 AS DECIMAL(18,6))
          |  WHEN pos = n_touch - 1 THEN CAST(
          |    CAST(0.2 AS DECIMAL(18,6)) - (n_touch - 3) *
          |    CAST(0.2 / CAST(n_touch - 2 AS DOUBLE) AS DECIMAL(18,6))
          |    AS DECIMAL(18,6))
          |  ELSE CAST(0.2 / CAST(n_touch - 2 AS DOUBLE) AS DECIMAL(18,6))
          |END""".stripMargin))
    credit.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        count_distinct(col("purchase_id")).as("n_purchases"),
        expr("CAST(sum(credit) AS DOUBLE)").as("credit"))
      .orderBy("channel")
  }

  /** Oracle for [[multiTouchAttribution]]: the same windowed join,
    * U-shape cases, and decimal credit sums. */
  def multiTouchAttributionSql(windowHours: Int = 24): String =
    s"""WITH p AS (
       |  SELECT event_id AS purchase_id, user_id, ts AS p_ts
       |  FROM events WHERE event_type = 'purchase'),
       |t AS (
       |  SELECT user_id, event_id AS touch_id, event_type AS channel,
       |    ts AS t_ts
       |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
       |j AS (
       |  SELECT t.channel, t.touch_id, t.t_ts, p.purchase_id
       |  FROM t JOIN p ON t.user_id = p.user_id
       |    AND t.t_ts <= p.p_ts
       |    AND t.t_ts >= p.p_ts - INTERVAL $windowHours HOUR),
       |c AS (
       |  SELECT channel, purchase_id,
       |    row_number() OVER (PARTITION BY purchase_id
       |      ORDER BY t_ts, touch_id) AS pos,
       |    count(*) OVER (PARTITION BY purchase_id) AS n_touch
       |  FROM j),
       |cr AS (
       |  SELECT channel, purchase_id,
       |    CASE WHEN n_touch = 1 THEN CAST(1.0 AS DECIMAL(18,6))
       |      WHEN n_touch = 2 THEN CAST(0.5 AS DECIMAL(18,6))
       |      WHEN pos = 1 OR pos = n_touch THEN CAST(0.4 AS DECIMAL(18,6))
       |      WHEN pos = n_touch - 1 THEN CAST(
       |        CAST(0.2 AS DECIMAL(18,6)) - (n_touch - 3) *
       |        CAST(0.2 / CAST(n_touch - 2 AS DOUBLE) AS DECIMAL(18,6))
       |        AS DECIMAL(18,6))
       |      ELSE CAST(0.2 / CAST(n_touch - 2 AS DOUBLE) AS DECIMAL(18,6))
       |    END AS credit
       |  FROM c)
       |SELECT channel, count(*)::BIGINT AS n_touches,
       |  count(DISTINCT purchase_id)::BIGINT AS n_purchases,
       |  CAST(sum(credit) AS DOUBLE) AS credit
       |FROM cr GROUP BY channel ORDER BY channel""".stripMargin

  /** Robust per-type outlier screen via median/MAD — the
    * heavy-tail-safe sibling of [[valueStatsByType]]'s mean/stddev
    * (one corrupt burst moves a mean arbitrarily; the median and the
    * median absolute deviation barely notice — Hampel's rule, the
    * production default for sensor/metric streams). A value is flagged
    * when |v − median| > 3 · 1.4826 · MAD (1.4826 rescales MAD to σ
    * under normality).
    *
    * Scale shape: exact per-group percentiles cost one per-group sort
    * each (the [[valueWinsorized]] trade — the approx-sketch
    * alternative lives in `value_percentiles_approx`); the medians are
    * a 5-row broadcast back into the scan, so the flagging pass never
    * shuffles events. Both medians are quantized through
    * DECIMAL(18,6), making the threshold compare engine-exact. */
  def valueMad(events: DataFrame): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(expr(
        "CAST(CAST(percentile(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE)")
        .as("med"))
    val dev = events.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(first(col("med")).as("med"),
        expr(
          "CAST(CAST(percentile(adev, 0.5) AS DECIMAL(18,6)) AS DOUBLE)")
          .as("mad"))
    dev.drop("med").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_share",
        expr("CAST(n_outliers AS DOUBLE) / CAST(n AS DOUBLE)"))
      .select(col("event_type"), col("n"), col("med"), col("mad"),
        col("n_outliers"), col("outlier_share"))
      .orderBy("event_type")
  }

  /** Oracle for [[valueMad]]: the same quantized medians and Hampel
    * threshold. */
  val valueMadSql: String =
    """WITH med AS (
      |  SELECT event_type,
      |    CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE)
      |      AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, med.med, abs(e.value - med.med) AS adev
      |  FROM events e JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, any_value(med) AS med,
      |    CAST(CAST(quantile_cont(adev, 0.5) AS DECIMAL(18,6)) AS DOUBLE)
      |      AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, count(*)::BIGINT AS n,
      |  any_value(m.med) AS med, any_value(m.mad) AS mad,
      |  sum(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END)::BIGINT
      |    AS n_outliers,
      |  CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0
      |    END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS outlier_share
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  /** Oracle for [[variantLift]]: the same decimal two-sums, control
    * pick, and verbatim Welch chain. */
  val variantLiftSql: String =
    s"""WITH arms AS (
       |  SELECT json_extract_string(props, '$$.k') AS experiment_id,
       |    event_type AS variant, count(*) AS n,
       |    $SumValue AS s1,
       |    $SumValueSq AS s2
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT experiment_id, variant, n, s1, s2,
       |    s1 / CAST(n AS DOUBLE) AS mean_value,
       |    CASE WHEN n > 1 THEN
       |      greatest(CAST(0 AS DOUBLE),
       |        s2 - (s1 * s1) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
       |    END AS var_value
       |  FROM arms),
       |ctl AS (
       |  SELECT m.experiment_id, m.variant AS control_variant,
       |    m.n AS n_ctl, m.mean_value AS mean_ctl, m.var_value AS var_ctl
       |  FROM m
       |  JOIN (SELECT experiment_id, min(variant) AS variant
       |        FROM m GROUP BY 1) c
       |    ON m.experiment_id = c.experiment_id AND m.variant = c.variant)
       |SELECT m.experiment_id, m.variant, m.n, m.mean_value,
       |  ctl.control_variant, ctl.mean_ctl,
       |  m.mean_value - ctl.mean_ctl AS lift,
       |  CASE WHEN m.variant <> ctl.control_variant AND m.n > 1
       |    AND ctl.n_ctl > 1
       |    AND m.var_value / CAST(m.n AS DOUBLE)
       |      + ctl.var_ctl / CAST(ctl.n_ctl AS DOUBLE) > 0 THEN
       |    CAST(CAST(
       |      (m.mean_value - ctl.mean_ctl)
       |      / sqrt(m.var_value / CAST(m.n AS DOUBLE)
       |             + ctl.var_ctl / CAST(ctl.n_ctl AS DOUBLE))
       |    AS DECIMAL(18,9)) AS DOUBLE)
       |  END AS t_welch
       |FROM m JOIN ctl ON m.experiment_id = ctl.experiment_id
       |ORDER BY m.experiment_id, m.variant""".stripMargin

  // ---------------------------------------------------------------
  // Benjamini–Hochberg FDR over the experiment battery
  // ---------------------------------------------------------------

  /** erfc(z) for z ≥ 0 as a shared Spark/DuckDB scalar chain —
    * Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7, far inside a
    * p-value readout's tolerance): erfc(z) = (a₁t + … + a₅t⁵)·e^(−z²)
    * with t = 1/(1+pz). The ONE transcendental, exp(−z²), quantizes
    * through DECIMAL(18,9) (the `source_kl` convention — engines
    * agree on the quantized value); every other step is IEEE +,·,/
    * on identical operands, bit-equal across engines by correct
    * rounding. Constants carry the e0 suffix so both parsers read
    * them as DOUBLE literals. Needed because DuckDB ships no erf/erfc
    * (verified 1.x: `erf` does not resolve). */
  private[graft] def erfcChain(z: String): String = {
    val t = s"(1.0e0 / (1.0e0 + 0.3275911e0 * ($z)))"
    val e = s"(floor(exp(-(($z) * ($z))) * 1e9 + 0.5e0) / 1e9)"
    s"""((((1.061405429e0 * $t - 1.453152027e0) * $t + 1.421413741e0) * $t
       |  - 0.284496736e0) * $t + 0.254829592e0) * $t * $e""".stripMargin
  }

  // battery scalar chains, shared verbatim with the oracle: z is the
  // half-normal deviate of each test's stat (|t|/√2 for the Welch
  // readout under its large-sample normal reading; √(χ²/2) = √χ²/√2
  // for the 1-df chi-square, via P(χ²₁ > x) = erfc(√(x/2))); the
  // two-sided normal p IS erfc(z). 1/√2 is written as its nearest
  // double literal so both engines multiply by the identical constant.
  private val FdrZ =
    """CASE WHEN test = 'welch_z'
      |  THEN abs(stat) * 0.7071067811865476e0
      |  ELSE sqrt(stat) * 0.7071067811865476e0 END""".stripMargin
  // floor-lattice quantization (the vocabCoverage convention), NOT a
  // DECIMAL cast: q_raw = quantized-p · m/rank lands EXACTLY on
  // half-quantum points by construction, where Spark's HALF_UP
  // double→DECIMAL cast and DuckDB's disagree — floor(x·1e9 + 0.5) of
  // bit-identical doubles is identical by IEEE exactness (verified:
  // the DECIMAL form mismatched 8/299 rows at the 1e-9 digit)
  private def fdrP: String =
    s"(floor((${erfcChain("z")}) * 1e9 + 0.5e0) / 1e9)"
  private val FdrQ =
    "(floor(least(CAST(1.0 AS DOUBLE), q_run) * 1e9 + 0.5e0) / 1e9)"

  /** Benjamini–Hochberg FDR control across the WHOLE experiment
    * battery — the correction layer over [[variantLift]]'s Welch-t and
    * [[variantConversion]]'s chi-square readouts (Benjamini &
    * Hochberg, JRSS-B 1995: rank the m p-values ascending, reject all
    * hypotheses with p_(i) ≤ (i/m)α — equivalently q_(i) =
    * min_{j≥i} p_(j)·m/j ≤ α). A user running 100 experiments × 3
    * arms otherwise reads 300 uncorrected readouts and false-discovers
    * at the battery scale; this face turns them into one
    * FDR-controlled decision set. The reference's dashboard stops at
    * per-arm uniques (`TimeseriesMetricsController.java:109-136`) —
    * this is the statistical layer above it.
    *
    * Both test families enter one battery: each treated arm
    * contributes its Welch-t row (two-sided normal p — the
    * large-sample reading; erfc chain above) and its 2×2 chi-square
    * row (1-df p). Degenerate arms (NULL stat — n ≤ 1, zero margins)
    * are not tests and drop. BH's step-up min runs as a reverse
    * running-min window; all BH windows are unpartitioned but run on
    * the BOUNDED battery table (2 rows per treated arm — arms ×
    * experiments, hundreds at any corpus scale; PlanSpec allowlist).
    *
    * Scale shape: ONE events scan into the (experiment, variant) arm
    * grain carrying n, the two decimal moment sums and the conversion
    * count (the [[variantLift]]/[[variantConversion]] grains fused —
    * one shuffle where running both faces would take two); everything
    * downstream is the bounded battery.
    *
    * Output: (test, experiment_id, variant, stat, p_value, m, rank,
    * q_value, reject) ordered by rank (= ascending p with a total
    * tiebreak). */
  def fdrExperiments(events: DataFrame, alpha: Double = 0.05,
      threshold: Double = 100.0): DataFrame =
    fdrFromArms(armEvents(events)
      .groupBy(col("experiment_id"), col("variant"))
      .agg(count(lit(1)).as("n"),
        expr(s"$SumValue").as("s1"),
        expr(s"$SumValueSq").as("s2"),
        sum(when(col("value") > threshold, 1L).otherwise(0L)).as("conv")),
      alpha)

  /** The derivation TAIL of [[fdrExperiments]] — from a bounded arm
    * table `(experiment_id, variant, n, s1, s2, conv)` to the
    * BH-adjusted battery. Split out (the [[liftFromArms]] pattern) so
    * the streaming face
    * ([[graft.streaming.StreamingMetrics.startFdrExperiments]])
    * replays the IDENTICAL chain over its running arm state: the arm
    * sums are algebraic, so the streamed battery after any micro-batch
    * slicing is bit-equal to the batch face over the same events
    * (asserted in `StreamingSpec`). */
  private[graft] def fdrFromArms(armsIn: DataFrame,
      alpha: Double): DataFrame =
    bhAdjust(experimentBattery(armsIn), alpha)

  /** The shared battery CONSTRUCTION — from the fused arm table to
    * one (test, experiment_id, variant, stat, p_value) row per valid
    * readout. Split out so both correction procedures ([[bhAdjust]]
    * step-up FDR and [[holmAdjust]] step-down FWER) consume the
    * identical battery. */
  private[graft] def experimentBattery(armsIn: DataFrame): DataFrame = {
    val arms = armsIn
      .withColumn("mean_value", expr("s1 / CAST(n AS DOUBLE)"))
      .withColumn("var_value", expr(
        """CASE WHEN n > 1 THEN
          |  greatest(CAST(0 AS DOUBLE),
          |    s2 - (s1 * s1) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
          |END""".stripMargin))
      .withColumn("control_variant",
        first(col("variant")).over(ArmControlWindow))
      .withColumn("n_ctl", first(col("n")).over(ArmControlWindow))
      .withColumn("mean_ctl", first(col("mean_value")).over(ArmControlWindow))
      .withColumn("var_ctl", first(col("var_value")).over(ArmControlWindow))
      .withColumn("conv_ctl", first(col("conv")).over(ArmControlWindow))
    val treated = arms
      .where(col("variant") =!= col("control_variant"))
      .withColumn("t_welch", expr(WelchTChain))
      .withColumn("chi2", expr(ConvChi2))
    val battery = treated
      .select(col("experiment_id"), col("variant"),
        explode(expr(
          """array(named_struct('test', 'welch_z', 'stat', t_welch),
            |      named_struct('test', 'chi2', 'stat', chi2))"""
            .stripMargin)).as("r"))
      .select(col("experiment_id"), col("variant"),
        col("r.test").as("test"), col("r.stat").as("stat"))
      .where(col("stat").isNotNull)
      .withColumn("z", expr(FdrZ))
      .withColumn("p_value", expr(fdrP))
    battery.select(col("test"), col("experiment_id"), col("variant"),
      col("stat"), col("p_value"))
  }

  /** The BH step-up tail over an arbitrary battery frame carrying
    * `(test, experiment_id, variant, stat, p_value)` — split out so
    * fixtures feed hand p-value tables (AnalyticsSpec checks the
    * adjusted q-values against the hand-computed step-up). */
  private[graft] def bhAdjust(battery: DataFrame,
      alpha: Double): DataFrame = {
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(col("p_value"), col("test"),
      col("experiment_id"), col("variant"))
    val wRev = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    battery
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("q_raw",
        expr("p_value * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE)"))
      .withColumn("q_run", min(col("q_raw")).over(wRev))
      .withColumn("q_value", expr(FdrQ))
      .withColumn("reject", col("q_value") <= lit(alpha))
      .select(col("test"), col("experiment_id"), col("variant"),
        col("stat"), col("p_value"), col("m"), col("rank"),
        col("q_value"), col("reject"))
      .orderBy("rank")
  }

  /** Holm–Bonferroni step-down over the SAME battery — the
    * family-wise-error sibling of [[fdrExperiments]]'s FDR (Holm,
    * Scand. J. Stat. 1979: rank the m p-values ascending, adjusted
    * p_(i) = max_{j≤i} min(1, (m−j+1)·p_(j)), reject while adjusted
    * p ≤ α). Uniformly more powerful than plain Bonferroni with the
    * same FWER guarantee — the correction a team reads when ANY false
    * positive is costly, where BH bounds only the false-discovery
    * RATE. Identical scale shape: the battery is arm-bounded, the
    * step-down is a rank + forward running-max window.
    *
    * Output: (test, experiment_id, variant, stat, p_value, m, rank,
    * p_adj, reject) ordered by rank. */
  def holmExperiments(events: DataFrame, alpha: Double = 0.05,
      threshold: Double = 100.0): DataFrame =
    holmAdjust(experimentBattery(armEvents(events)
      .groupBy(col("experiment_id"), col("variant"))
      .agg(count(lit(1)).as("n"),
        expr(s"$SumValue").as("s1"),
        expr(s"$SumValueSq").as("s2"),
        sum(when(col("value") > threshold, 1L).otherwise(0L)).as("conv"))),
      alpha)

  /** The Holm step-down tail over an arbitrary battery frame (the
    * [[bhAdjust]] fixture pattern). */
  private[graft] def holmAdjust(battery: DataFrame,
      alpha: Double): DataFrame = {
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(col("p_value"), col("test"),
      col("experiment_id"), col("variant"))
    val wFwd = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    battery
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("p_raw", expr(HolmRaw))
      .withColumn("p_run", max(col("p_raw")).over(wFwd))
      .withColumn("p_adj", expr(HolmAdj))
      .withColumn("reject", col("p_adj") <= lit(alpha))
      .select(col("test"), col("experiment_id"), col("variant"),
        col("stat"), col("p_value"), col("m"), col("rank"),
        col("p_adj"), col("reject"))
      .orderBy("rank")
  }

  // Holm scalar chains, shared verbatim with the oracle: the
  // (m−i+1)·p product is IEEE on the lattice p, the monotone fold is
  // an integer-window max, the clamp+quantize is the FdrQ discipline
  private val HolmRaw =
    """least(CAST(1.0 AS DOUBLE),
      |  p_value * CAST(m - rank + 1 AS DOUBLE))""".stripMargin
  private val HolmAdj =
    "(floor(p_run * 1e9 + 0.5e0) / 1e9)"

  // the shared battery CTE chain (through `bp`: one row per valid
  // (test, arm) readout with its lattice p) — both correction oracles
  // append their own tails so the battery text can never drift
  private def batterySqlCtes(threshold: Double): String =
    s"""arms AS (
       |  SELECT json_extract_string(props, '$$.k') AS experiment_id,
       |    event_type AS variant, count(*)::BIGINT AS n,
       |    $SumValue AS s1,
       |    $SumValueSq AS s2,
       |    CAST(sum(CASE WHEN value > $threshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conv
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |mv AS (
       |  SELECT *, s1 / CAST(n AS DOUBLE) AS mean_value,
       |    CASE WHEN n > 1 THEN
       |      greatest(CAST(0 AS DOUBLE),
       |        s2 - (s1 * s1) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
       |    END AS var_value
       |  FROM arms),
       |f AS (
       |  SELECT experiment_id, variant, n, conv, mean_value, var_value,
       |    first_value(variant) OVER w AS control_variant,
       |    first_value(n) OVER w AS n_ctl,
       |    first_value(mean_value) OVER w AS mean_ctl,
       |    first_value(var_value) OVER w AS var_ctl,
       |    first_value(conv) OVER w AS conv_ctl
       |  FROM mv
       |  WINDOW w AS (PARTITION BY experiment_id ORDER BY variant
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
       |tt AS (
       |  SELECT experiment_id, variant,
       |    $WelchTChain AS t_welch,
       |    $ConvChi2 AS chi2
       |  FROM f WHERE variant <> control_variant),
       |batt AS (
       |  SELECT experiment_id, variant, 'welch_z' AS test,
       |    t_welch AS stat
       |  FROM tt WHERE t_welch IS NOT NULL
       |  UNION ALL
       |  SELECT experiment_id, variant, 'chi2', chi2
       |  FROM tt WHERE chi2 IS NOT NULL),
       |bz AS (
       |  SELECT *, $FdrZ AS z FROM batt),
       |bp AS (
       |  SELECT experiment_id, variant, test, stat, $fdrP AS p_value
       |  FROM bz),
       |br AS (
       |  SELECT *, count(*) OVER () AS m,
       |    row_number() OVER (ORDER BY p_value, test, experiment_id,
       |      variant) AS rank
       |  FROM bp)""".stripMargin

  // the BH step-up SQL tail over a CTE named `br` carrying
  // (test, experiment_id, variant, stat, p_value, m, rank) — shared
  // by fdrExperimentsSql and mwuExperimentsSql so the correction text
  // can never drift between batteries
  private def bhTailSql(alpha: Double): String =
    s"""bq AS (
       |  SELECT *,
       |    p_value * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE) AS q_raw
       |  FROM br),
       |bm AS (
       |  SELECT *, min(q_raw) OVER (ORDER BY rank DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_run
       |  FROM bq),
       |qq AS (
       |  SELECT test, experiment_id, variant, stat, p_value,
       |    m::BIGINT AS m, rank::BIGINT AS rank, $FdrQ AS q_value
       |  FROM bm)
       |SELECT test, experiment_id, variant, stat, p_value, m, rank,
       |  q_value, q_value <= $alpha AS reject
       |FROM qq ORDER BY rank""".stripMargin

  /** DuckDB replay of [[fdrExperiments]]: the shared battery CTEs,
    * then BH as the same rank + reverse running-min. */
  def fdrExperimentsSql(alpha: Double = 0.05,
      threshold: Double = 100.0): String =
    s"""WITH ${batterySqlCtes(threshold)},
       |${bhTailSql(alpha)}""".stripMargin

  /** DuckDB replay of [[holmExperiments]]: the shared battery CTEs,
    * then the step-down as the same rank + forward running-max. */
  def holmExperimentsSql(alpha: Double = 0.05,
      threshold: Double = 100.0): String =
    s"""WITH ${batterySqlCtes(threshold)},
       |hr AS (
       |  SELECT *, $HolmRaw AS p_raw FROM br),
       |hm AS (
       |  SELECT *, max(p_raw) OVER (ORDER BY rank
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_run
       |  FROM hr),
       |hq AS (
       |  SELECT test, experiment_id, variant, stat, p_value,
       |    m::BIGINT AS m, rank::BIGINT AS rank, $HolmAdj AS p_adj
       |  FROM hm)
       |SELECT test, experiment_id, variant, stat, p_value, m, rank,
       |  p_adj, p_adj <= $alpha AS reject
       |FROM hq ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------
  // Mann–Whitney U (rank-sum) over the experiment battery
  // ---------------------------------------------------------------

  // exact x³ − x on the DECIMAL lattice: counts are cast to
  // DECIMAL(12,0) so the triple product lands at DECIMAL(38,0) in
  // Spark (12+12+1, then 25+12+1) and DECIMAL(36,0) in DuckDB —
  // exact in both for any tie group up to 10¹² rows (a bound no real
  // per-(experiment, value) cell approaches; 12 is also the widest
  // operand whose cube stays decimal-exact in DuckDB, where multiply
  // precision is p1+p2 capped at 38). Past the bound both engines
  // fail LOUD — DuckDB at this cast, Spark via [[guard12]] below.
  private def cubeMinus(x: String): String =
    s"""(CAST($x AS DECIMAL(12,0)) * CAST($x AS DECIMAL(12,0))
       |  * CAST($x AS DECIMAL(12,0)) - CAST($x AS DECIMAL(12,0)))"""
      .stripMargin

  // the loud Spark-side edge of the 10¹² exactness bound: DuckDB's
  // CAST errors when a tie cell exceeds DECIMAL(12,0), but Spark's
  // non-ANSI cast NULLs instead — which would propagate tie → sig2 →
  // stat NULL and silently DROP the arm from the battery. Guarding
  // the operand restores the documented failure mode (abort, not
  // silent row loss) on the Spark side; the oracle SQL stays
  // unguarded because DuckDB is already loud. In-range cells take
  // the ELSE branch untouched, so results are bit-identical.
  private def guard12(x: String): String =
    s"""CASE WHEN $x > 999999999999 THEN
       |  CAST(raise_error(CONCAT('graft: tie-group cell ',
       |    CAST($x AS STRING),
       |    ' exceeds the 10^12 exactness bound')) AS BIGINT)
       |ELSE $x END""".stripMargin

  // the tie-corrected normal-approximation variance of U — shared
  // verbatim with the oracle; operands (n_t, n_c BIGINT; tie DOUBLE
  // from exact decimals) are identical across engines, so every IEEE
  // step is bit-equal
  private val MwuSig2 =
    """(CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE) / 12.0e0)
      |* ((CAST(n_t + n_c AS DOUBLE) + 1.0e0)
      |   - tie / (CAST(n_t + n_c AS DOUBLE)
      |            * (CAST(n_t + n_c AS DOUBLE) - 1.0e0)))""".stripMargin

  /** Mann–Whitney U (Wilcoxon rank-sum) over the experiment battery —
    * the NONPARAMETRIC sibling of [[fdrExperiments]]'s Welch-t/χ²
    * readouts (Mann & Whitney, Ann. Math. Stat. 1947). Welch assumes
    * the arm means are normal enough for the t to mean something;
    * heavy-tailed value metrics (revenue is the canonical case) break
    * that, and the rank test is what an analyst reaches for. Each
    * treated arm is tested against its experiment's control arm
    * (alphabetically-first variant, the [[variantLift]] convention);
    * the m p-values then ride the SAME [[bhAdjust]] step-up tail, so
    * the output is schema-identical to `fdr_experiments`.
    *
    * U is computed WITHOUT materializing per-row ranks — the
    * mid-rank formulation over the (experiment, value) tie-group
    * grain:
    *
    *   U_t = Σ_v cnt_t(v) · (C_<(v) + cnt_c(v)/2)
    *
    * where C_<(v) is the running control count strictly below v.
    * 2·U stays on the DECIMAL(18,0)-product lattice (exact integers;
    * one 38,0 sum), and the tie correction Σ(t³−t) over the COMBINED
    * two-sample tie groups splits into a per-arm part (values the arm
    * touches) plus a per-experiment control constant — so every
    * treated arm prices its ties without rescanning control.
    *
    * Significance is the continuity-corrected large-sample normal
    * reading (the scipy `mannwhitneyu(use_continuity=True)`
    * convention): z = (|U − n_t·n_c/2| − ½)⁺ / σ_tie, two-sided p =
    * erfc(z/√2) on the [[erfcChain]] lattice. Arms whose combined
    * sample is all ties (σ² = 0) are not tests and drop, like the
    * degenerate Welch arms.
    *
    * Scale shape: ONE events scan to the (experiment, value, variant)
    * tie-group grain (map-side combined; the grain is bounded by the
    * experiment × 2-decimal-value domain, not by rows), a bounded
    * per-experiment control pick, a cumulative-count window
    * PARTITIONED by experiment over the (experiment, value) grain
    * (never a global sort — the per-experiment rank the r15 verdict
    * asked for), one (experiment, value) equi-join, then everything
    * downstream is the arm-bounded battery. No allowlist entry needed
    * beyond [[bhAdjust]]'s own (the battery windows are arm-bounded).
    *
    * Output: (test='mwu_u', experiment_id, variant, stat=U, p_value,
    * m, rank, q_value, reject) ordered by rank. */
  def mwuExperiments(events: DataFrame,
      alpha: Double = 0.05): DataFrame =
    bhAdjust(mwuBattery(events), alpha)

  /** [[mwuExperiments]] from a pre-aggregated tie-group grain — the
    * [[fdrFromArms]] analogue the streaming face replays per
    * micro-batch. */
  private[graft] def mwuFromGrain(grain: DataFrame,
      alpha: Double): DataFrame =
    bhAdjust(mwuBatteryFromGrain(grain), alpha)

  /** The MWU battery CONSTRUCTION — one (test, experiment_id,
    * variant, stat, p_value) row per treated arm with a non-degenerate
    * rank readout. Split out (the [[experimentBattery]] pattern) so
    * fixtures can assert U / p against hand-computed tables and so
    * [[holmAdjust]] could consume the identical battery. */
  private[graft] def mwuBattery(events: DataFrame): DataFrame = {
    // ONE events scan: the tie-group grain feeds four downstream
    // consumers (control pick, merged value grain, control constants,
    // treated rows) — without the cache boundary each re-derives it
    // from the corpus scan (measured: 6 parquet scans in the
    // un-cached plan). The grain is DOMAIN-bounded (experiments ×
    // 2-decimal values × variants), so the cache is small at any
    // corpus size; ContextCleaner releases it when the caller drops
    // the frame (the btStrength convention).
    val grain = armEvents(events)
      // NULL values are not rankable observations: without this
      // filter control rows with NULL value would count into n_c/tie
      // while the (experiment, value) equi-join silently dropped
      // NULL treated rows from U — and the cumulative window would
      // diverge cross-engine (Spark sorts NULLS FIRST, DuckDB NULLS
      // LAST). The valueBootstrapCi convention.
      .where(col("value").isNotNull)
      .groupBy(col("experiment_id"), col("value"), col("variant"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    mwuBatteryFromGrain(grain)
  }

  /** The derivation TAIL of [[mwuExperiments]]'s battery — from the
    * bounded tie-group grain `(experiment_id, value, variant, cnt)`
    * to the (test, experiment_id, variant, stat, p_value) rows. Split
    * out (the [[fdrFromArms]] pattern) so the streaming face
    * ([[graft.streaming.StreamingMetrics.startMwuExperiments]])
    * replays the IDENTICAL chain over its running grain state: the
    * counts are algebraic, so the streamed battery after any
    * micro-batch slicing is bit-equal to the batch face over the
    * same events. The streaming caller passes its own (unpersisted,
    * state-snapshot-backed) grain; only the batch face caches. */
  private[graft] def mwuBatteryFromGrain(grain: DataFrame): DataFrame = {
    val ctl = grain
      .groupBy(col("experiment_id"))
      .agg(min(col("variant")).as("control_variant"))
    // (experiment, value) grain carrying the control count at that
    // value (0 where control never hit it) — the frame the running
    // strictly-below control count walks over
    val merged = grain
      .join(broadcast(ctl), Seq("experiment_id"))
      .groupBy(col("experiment_id"), col("value"))
      .agg(sum(when(col("variant") === col("control_variant"),
        col("cnt")).otherwise(0L)).as("cnt_c"))
    val wCum = Window.partitionBy(col("experiment_id"))
      .orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-experiment control constants — arm size and the control-only
    // tie-correction term Σ(cnt_c³ − cnt_c) (zero for cnt_c ≤ 1) —
    // ride the SAME per-experiment window pass as the running count
    // (full-frame spec, same partitioning → no extra exchange),
    // instead of a second aggregate over `merged` joined back in:
    // that formulation re-derived the whole merged subtree a second
    // time (merged fed two un-cached consumers) and paid one more
    // HashAggregate + broadcast join. The sums are LONG / exact
    // DECIMAL, so window-vs-groupBy accumulation is bit-identical.
    val wExp = Window.partitionBy(col("experiment_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = merged
      .withColumn("cum_excl",
        coalesce(sum(col("cnt_c")).over(wCum), lit(0L)))
      .withColumn("n_c", sum(col("cnt_c")).over(wExp))
      .withColumn("tie_c",
        sum(expr(cubeMinus(guard12("cnt_c")))).over(wExp).cast("double"))
    val treated = grain
      .join(broadcast(ctl), Seq("experiment_id"))
      .where(col("variant") =!= col("control_variant"))
      .join(cum.select(col("experiment_id"), col("value"),
        col("cnt_c"), col("cum_excl"), col("n_c"), col("tie_c")),
        Seq("experiment_id", "value"))
    // per treated arm: n_t, 2U (exact DECIMAL), and the arm part of
    // the combined tie sum — Σ over touched values of
    // ((cnt_c+cnt_t)³ − (cnt_c+cnt_t)) − (cnt_c³ − cnt_c); adding the
    // per-experiment control constant completes Σ(t³−t) over the
    // combined sample because untouched values contribute exactly
    // their control-only term
    val arms = treated
      .groupBy(col("experiment_id"), col("variant"))
      .agg(sum(col("cnt")).as("n_t"),
        expr(
          """CAST(sum(CAST(cnt AS DECIMAL(18,0))
            |  * CAST(2 * cum_excl + cnt_c AS DECIMAL(18,0)))
            |AS DOUBLE)""".stripMargin).as("two_u"),
        expr(s"""CAST(sum(${cubeMinus(guard12("(cnt_c + cnt)"))}
                |  - ${cubeMinus(guard12("cnt_c"))}) AS DOUBLE)"""
            .stripMargin)
          .as("tie_t"),
        // per-experiment constants carried on every treated row —
        // max() just reads the constant back out
        max(col("n_c")).as("n_c"), max(col("tie_c")).as("tie_c"))
      .withColumn("tie", col("tie_t") + col("tie_c"))
      .withColumn("sig2", expr(MwuSig2))
      .withColumn("stat", expr(
        """CASE WHEN n_t >= 1 AND n_c >= 1 AND sig2 > 0.0e0
          |THEN two_u / 2.0e0 END""".stripMargin))
      .where(col("stat").isNotNull)
    arms
      .withColumn("z", expr(
        """greatest(0.0e0,
          |  abs(stat - CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE) / 2.0e0)
          |  - 0.5e0) / sqrt(sig2) * 0.7071067811865476e0""".stripMargin))
      .withColumn("p_value", expr(fdrP))
      .select(lit("mwu_u").as("test"), col("experiment_id"),
        col("variant"), col("stat"), col("p_value"))
  }

  // ---------------------------------------------------------------
  // CUPED variance-reduced experiment readout
  // ---------------------------------------------------------------

  /** CUPED-adjusted per-arm means (Deng, Xu, Kohavi & Walker,
    * "Improving the sensitivity of online controlled experiments by
    * utilizing pre-experiment data", WSDM 2013) — the industry-
    * standard variance-reduction layer over [[variantLift]]'s raw
    * means: Ŷ = Ȳ_arm − θ·(X̄_arm − X̄), with X a pre-experiment
    * covariate and θ = cov(X,Y)/var(X) pooled per experiment. The
    * same lift estimate, tighter — var shrinks by the squared X,Y
    * correlation (reported as `var_reduction`).
    *
    * Period construction (deterministic, oracle-shared): each
    * experiment's time range splits at its midpoint (integer
    * microseconds — `unix_micros` ≡ DuckDB `epoch_us`); the PRE
    * period is the covariate window, the POST period carries the
    * measured metric. Unit = (user, variant): Y is the user's
    * post-period mean value on that variant's events, X the user's
    * pre-period mean over ALL their events in the experiment —
    * pre-assignment behavior is variant-independent, which is
    * exactly what makes X a valid CUPED covariate. Units missing
    * either period drop; experiments with degenerate pooled
    * var(X) or var(Y) (θ undefined / reduction meaningless) drop.
    *
    * Exactness: per-unit means quantize onto the 1e-6 floor lattice
    * as BIGINTs; every pooled/arm moment (Σx, Σy, Σxy, Σx², Σy²) is
    * then an exact DECIMAL sum of integer products — order-free —
    * and θ, the adjusted means and r² are fixed IEEE chains over
    * exact operands, floor-quantized at 1e-9 on output.
    *
    * Scale shape: one bounds pass (experiment-grain min/max,
    * broadcast back), then ONE events scan to the (experiment, user,
    * variant, period) grain with decimal sums; everything downstream
    * is unit- then arm-bounded. No corpus-sized cache, no
    * unpartitioned window.
    *
    * Output: (experiment_id, variant, n_units, mean_y, mean_y_cuped,
    * theta, var_reduction) ordered by (experiment_id, variant). */
  def cupedLift(events: DataFrame): DataFrame = {
    val base = cupedBase(events)
    val bounds = base.groupBy(col("experiment_id"))
      .agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(col("experiment_id"),
        expr("lo + (hi - lo) div 2").as("mid"))
    // ONE scan to the (experiment, user, variant, period) grain; the
    // value sum stays RAW DECIMAL here (a double→DECIMAL re-cast at
    // the next rollup would hit the §8 portability hazard)
    cupedFromG1(base.join(broadcast(bounds), Seq("experiment_id"))
      .groupBy(col("experiment_id"), col("user_id"), col("variant"),
        (col("us") <= col("mid")).as("pre"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("s")))
  }

  // the event projection [[cupedLift]] and its streaming face share:
  // value IS NOT NULL keeps n and the moment sums over the SAME rows
  // (count(lit(1)) would count NULL-value rows the decimal sum skips,
  // silently skewing the per-unit means and θ)
  private[graft] def cupedBase(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").as("experiment_id"),
        col("user_id"), col("event_type").as("variant"), col("value"),
        expr("unix_micros(ts)").as("us"))
      .where(col("experiment_id").isNotNull && col("user_id").isNotNull
        && col("value").isNotNull)

  /** The derivation TAIL of [[cupedLift]] — from the per-unit period
    * grain `(experiment_id, user_id, variant, pre, n, s)` to the
    * adjusted-mean readout. Split out (the [[mwuFromGrain]] pattern)
    * so the streaming face
    * ([[graft.streaming.StreamingMetrics.startCupedLift]]) replays
    * the IDENTICAL chain over its running per-unit moments: n and the
    * raw-DECIMAL s are algebraic, so the streamed readout after any
    * micro-batch slicing is bit-equal to a batch run at the same
    * period split. */
  private[graft] def cupedFromG1(g1: DataFrame): DataFrame = {
    // covariate: the user's pre-period mean over ALL variants,
    // quantized to the 1e-6 integer lattice
    val xs = g1.where(col("pre"))
      .groupBy(col("experiment_id"), col("user_id"))
      .agg(sum(col("n")).as("xn"), sum(col("s")).as("xsum"))
      .select(col("experiment_id"), col("user_id"),
        expr("CAST(floor(CAST(xsum AS DOUBLE) / CAST(xn AS DOUBLE) " +
          "* 1e6 + 0.5e0) AS BIGINT)").as("xq"))
    // metric: the (user, variant) post-period mean, same lattice
    val ys = g1.where(!col("pre"))
      .select(col("experiment_id"), col("user_id"), col("variant"),
        expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) " +
          "* 1e6 + 0.5e0) AS BIGINT)").as("yq"))
    val units = ys.join(xs, Seq("experiment_id", "user_id"))
    // pooled per-experiment moments — exact decimal sums of lattice
    // integers (xq·yq products land at DECIMAL(37,0))
    val pooled = units.groupBy(col("experiment_id"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(xq AS DECIMAL(18,0))) AS DOUBLE)").as("sx"),
        expr("CAST(sum(CAST(yq AS DECIMAL(18,0))) AS DOUBLE)").as("sy"),
        expr("""CAST(sum(CAST(xq AS DECIMAL(18,0))
                |  * CAST(yq AS DECIMAL(18,0))) AS DOUBLE)"""
          .stripMargin).as("sxy"),
        expr("""CAST(sum(CAST(xq AS DECIMAL(18,0))
                |  * CAST(xq AS DECIMAL(18,0))) AS DOUBLE)"""
          .stripMargin).as("sxx"),
        expr("""CAST(sum(CAST(yq AS DECIMAL(18,0))
                |  * CAST(yq AS DECIMAL(18,0))) AS DOUBLE)"""
          .stripMargin).as("syy"))
      .withColumn("theta", expr(CupedTheta))
      .withColumn("var_reduction", expr(CupedR2))
      .where(col("theta").isNotNull && col("var_reduction").isNotNull)
    val arm = units.groupBy(col("experiment_id"), col("variant"))
      .agg(count(lit(1)).as("n_units"),
        expr("CAST(sum(CAST(xq AS DECIMAL(18,0))) AS DOUBLE)").as("sxa"),
        expr("CAST(sum(CAST(yq AS DECIMAL(18,0))) AS DOUBLE)").as("sya"))
    arm.join(pooled, Seq("experiment_id"))
      .select(col("experiment_id"), col("variant"), col("n_units"),
        expr(lattice9(CupedMeanY)).as("mean_y"),
        expr(lattice9(CupedAdj)).as("mean_y_cuped"),
        expr(lattice9("theta")).as("theta"),
        expr(lattice9("var_reduction")).as("var_reduction"))
      .orderBy("experiment_id", "variant")
  }

  // CUPED scalar chains, shared verbatim with the oracle; operands
  // are exact-decimal casts, so every IEEE step is bit-equal. The
  // 1e-6 lattice scale cancels in theta and r² (both are ratios of
  // second moments) and divides out of the mean chains.
  private val CupedTheta =
    """CASE WHEN n >= 2
      |  AND CAST(n AS DOUBLE) * sxx - sx * sx > 0.0e0 THEN
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |  / (CAST(n AS DOUBLE) * sxx - sx * sx)
      |END""".stripMargin
  private val CupedR2 =
    """CASE WHEN n >= 2
      |  AND CAST(n AS DOUBLE) * sxx - sx * sx > 0.0e0
      |  AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0e0 THEN
      |  ((CAST(n AS DOUBLE) * sxy - sx * sy)
      |   / (CAST(n AS DOUBLE) * sxx - sx * sx))
      |  * ((CAST(n AS DOUBLE) * sxy - sx * sy)
      |     / (CAST(n AS DOUBLE) * syy - sy * sy))
      |END""".stripMargin
  private val CupedMeanY =
    "sya / CAST(n_units AS DOUBLE) / 1e6"
  private val CupedAdj =
    """sya / CAST(n_units AS DOUBLE) / 1e6
      |- theta * (sxa / CAST(n_units AS DOUBLE) / 1e6
      |           - sx / CAST(n AS DOUBLE) / 1e6)""".stripMargin
  private def lattice9(v: String): String =
    s"(floor(($v) * 1e9 + 0.5e0) / 1e9)"

  /** DuckDB replay of [[cupedLift]]: same midpoint split
    * (`epoch_us` ≡ `unix_micros`), lattice quantizations, decimal
    * moment sums and IEEE chains. */
  def cupedLiftSql(): String =
    s"""WITH base AS (
       |  SELECT json_extract_string(props, '$$.k') AS experiment_id,
       |    user_id, event_type AS variant, value, epoch_us(ts) AS us
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |    AND user_id IS NOT NULL AND value IS NOT NULL),
       |bounds AS (
       |  SELECT experiment_id, min(us) + (max(us) - min(us)) // 2
       |      AS mid
       |  FROM base GROUP BY 1),
       |g1 AS (
       |  SELECT b.experiment_id, b.user_id, b.variant,
       |    b.us <= bo.mid AS pre, count(*)::BIGINT AS n,
       |    sum(CAST(value AS DECIMAL(18,2))) AS s
       |  FROM base b JOIN bounds bo
       |    ON b.experiment_id = bo.experiment_id
       |  GROUP BY 1, 2, 3, 4),
       |xs AS (
       |  SELECT experiment_id, user_id,
       |    CAST(floor(
       |      CAST(sum(s) AS DOUBLE)
       |      / CAST(sum(n) AS DOUBLE) * 1e6 + 0.5e0) AS BIGINT) AS xq
       |  FROM g1 WHERE pre GROUP BY 1, 2),
       |ys AS (
       |  SELECT experiment_id, user_id, variant,
       |    CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e6
       |      + 0.5e0) AS BIGINT) AS yq
       |  FROM g1 WHERE NOT pre),
       |units AS (
       |  SELECT ys.experiment_id, ys.user_id, ys.variant, ys.yq, xs.xq
       |  FROM ys JOIN xs ON ys.experiment_id = xs.experiment_id
       |    AND ys.user_id = xs.user_id),
       |pooled AS (
       |  SELECT experiment_id, count(*)::BIGINT AS n,
       |    CAST(sum(CAST(xq AS DECIMAL(18,0))) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(yq AS DECIMAL(18,0))) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(xq AS DECIMAL(18,0))
       |      * CAST(yq AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
       |    CAST(sum(CAST(xq AS DECIMAL(18,0))
       |      * CAST(xq AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
       |    CAST(sum(CAST(yq AS DECIMAL(18,0))
       |      * CAST(yq AS DECIMAL(18,0))) AS DOUBLE) AS syy
       |  FROM units GROUP BY 1),
       |pt AS (
       |  SELECT *, $CupedTheta AS theta, $CupedR2 AS var_reduction
       |  FROM pooled),
       |pv AS (
       |  SELECT * FROM pt
       |  WHERE theta IS NOT NULL AND var_reduction IS NOT NULL),
       |arm AS (
       |  SELECT experiment_id, variant, count(*)::BIGINT AS n_units,
       |    CAST(sum(CAST(xq AS DECIMAL(18,0))) AS DOUBLE) AS sxa,
       |    CAST(sum(CAST(yq AS DECIMAL(18,0))) AS DOUBLE) AS sya
       |  FROM units GROUP BY 1, 2)
       |SELECT arm.experiment_id, arm.variant, arm.n_units,
       |  ${lattice9(CupedMeanY)} AS mean_y,
       |  ${lattice9(CupedAdj)} AS mean_y_cuped,
       |  ${lattice9("theta")} AS theta,
       |  ${lattice9("var_reduction")} AS var_reduction
       |FROM arm JOIN pv ON arm.experiment_id = pv.experiment_id
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // Kruskal–Wallis k-sample rank test per experiment
  // ---------------------------------------------------------------

  // the tie-corrected H and Wilson–Hilferty scalar chains, shared
  // verbatim with the oracle. d2 = (2R_i − n_i(N+1))² / (4 n_i) =
  // n_i·(r̄_i − r̄)² — the CENTERED per-arm term (exact integer
  // numerator; no catastrophic Σ R²/n − 3(N+1) cancellation).
  private val KwD2 =
    """(two_r - CAST(n_i AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
      |* (two_r - CAST(n_i AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
      |/ (4.0e0 * CAST(n_i AS DOUBLE))""".stripMargin
  private val KwH =
    """12.0e0 * ssd
      |/ (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0e0))"""
      .stripMargin
  private val KwCorr =
    """1.0e0 - tie_sum
      |/ (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
      |   * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))"""
      .stripMargin

  /** Kruskal–Wallis rank test across ALL arms of each experiment —
    * the k-sample completion of [[mwuExperiments]]'s two-sample
    * readout (Kruskal & Wallis, JASA 1952): one H per experiment
    * answering "do ANY of the arms differ", where MWU answers
    * per-arm-vs-control. Mid-ranks from the same tie-group grain
    * (2R_i exact on the DECIMAL(18,0)-product lattice), the standard
    * tie correction H' = H / (1 − Σ(t³−t)/(N³−N)), and the
    * χ²_{k−1} tail through the Wilson–Hilferty cube-root normal
    * approximation (A&S 26.4.14: z = ((H'/ν)^⅓ − (1 − 2/9ν)) /
    * √(2/9ν), one-sided survival via the shared [[erfcChain]];
    * cbrt is the one non-portable transcendental and rides the 1e-9
    * floor lattice like exp). Per-experiment arm terms fold in a
    * FIXED variant-sorted order (array fold; IEEE `0.0 + x` is
    * exact, so the Spark fold and DuckDB's `list_reduce` produce the
    * identical sum) — never an order-nondeterministic double SUM.
    *
    * Scale shape: the [[mwuExperiments]] story — one events scan to
    * the domain-bounded tie-group grain (cached; it feeds three
    * consumers), a per-experiment PARTITIONED cumulative window, one
    * (experiment, value) equi-join, then arm- and experiment-bounded
    * tails. Degenerate experiments drop: k < 2 arms, or all values
    * tied (the correction denominator hits 0).
    *
    * Output: (experiment_id, k_arms, n_total, h_stat, df, p_value)
    * ordered by experiment_id; h_stat is the tie-corrected H'. */
  def kruskalExperiments(events: DataFrame): DataFrame =
    // ONE events scan to the cached domain-bounded tie-group grain
    // (the [[mwuBattery]] convention — it feeds three consumers);
    // NULL values drop for the same cross-engine-rank reason.
    kruskalFromGrain(armEvents(events)
      .where(col("value").isNotNull)
      .groupBy(col("experiment_id"), col("value"), col("variant"))
      .agg(count(lit(1)).as("cnt"))
      .persist())

  /** The derivation TAIL of [[kruskalExperiments]] — from the bounded
    * tie-group grain `(experiment_id, value, variant, cnt)` to the
    * per-experiment H′ readout. Split out (the [[mwuFromGrain]]
    * pattern) so the streaming face
    * ([[graft.streaming.StreamingMetrics.startKruskalExperiments]])
    * replays the IDENTICAL chain over its running grain state: the
    * counts are algebraic, so the streamed readout after any
    * micro-batch slicing is bit-equal to the batch face over the same
    * events. The streaming caller passes its own (unpersisted,
    * state-snapshot-backed) grain; only the batch face caches. */
  private[graft] def kruskalFromGrain(grain: DataFrame): DataFrame = {
    val vg = grain
      .groupBy(col("experiment_id"), col("value"))
      .agg(sum(col("cnt")).as("cnt_all"))
    val wCum = Window.partitionBy(col("experiment_id"))
      .orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-experiment totals (n_total, tie_sum) ride the SAME
    // per-experiment window pass as the running count (full-frame
    // spec, same partitioning → no extra exchange) instead of a
    // second aggregate over `vg` joined back in — the [[
    // mwuBatteryFromGrain]] r18 rewrite: the join formulation
    // re-derived the whole vg subtree a second time and paid one more
    // HashAggregate + join. LONG / exact-DECIMAL sums, so
    // window-vs-groupBy accumulation is bit-identical.
    val wExp = Window.partitionBy(col("experiment_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = vg.withColumn("cum_excl",
        coalesce(sum(col("cnt_all")).over(wCum), lit(0L)))
      .withColumn("n_total", sum(col("cnt_all")).over(wExp))
      .withColumn("tie_sum",
        sum(expr(cubeMinus(guard12("cnt_all")))).over(wExp)
          .cast("double"))
    // per-arm mid-rank sums: 2R_i = Σ_v cnt_i(v)·(2·C_<(v) +
    // cnt_all(v) + 1) — exact decimal, one (experiment, value) join
    val arms = grain
      .join(cum.select(col("experiment_id"), col("value"),
        col("cnt_all"), col("cum_excl"), col("n_total"),
        col("tie_sum")), Seq("experiment_id", "value"))
      .groupBy(col("experiment_id"), col("variant"))
      .agg(sum(col("cnt")).as("n_i"),
        expr(
          """CAST(sum(CAST(cnt AS DECIMAL(18,0))
            |  * CAST(2 * cum_excl + cnt_all + 1 AS DECIMAL(18,0)))
            |AS DOUBLE)""".stripMargin).as("two_r"),
        // per-experiment constants carried on every grain row —
        // max() just reads the constant back out
        max(col("n_total")).as("n_total"),
        max(col("tie_sum")).as("tie_sum"))
    val byExp = arms
      .withColumn("d2", expr(KwD2))
      .groupBy(col("experiment_id"))
      .agg(first(col("n_total")).as("n_total"),
        first(col("tie_sum")).as("tie_sum"),
        count(lit(1)).as("k_arms"),
        sort_array(collect_list(struct(col("variant"), col("d2"))))
          .as("arr"))
      .withColumn("ssd", expr(
        "aggregate(arr, CAST(0 AS DOUBLE), (acc, x) -> acc + x.d2)"))
      .withColumn("corr", expr(KwCorr))
      .withColumn("h_stat", expr(
        s"""CASE WHEN k_arms >= 2 AND corr > 0.0e0
           |THEN ($KwH) / corr END""".stripMargin))
      .where(col("h_stat").isNotNull)
    byExp
      .withColumn("df", (col("k_arms") - 1L).cast("long"))
      .withColumn("cb", expr(
        """(floor(cbrt(h_stat / CAST(df AS DOUBLE)) * 1e9 + 0.5e0)
          |/ 1e9)""".stripMargin))
      .withColumn("z", expr(
        """(cb - (1.0e0 - 2.0e0 / (9.0e0 * CAST(df AS DOUBLE))))
          |/ sqrt(2.0e0 / (9.0e0 * CAST(df AS DOUBLE)))""".stripMargin))
      .withColumn("az", expr("abs(z) * 0.7071067811865476e0"))
      .withColumn("p_value", expr(
        s"""(floor((CASE WHEN z >= 0.0e0
           |  THEN (${erfcChain("az")}) / 2.0e0
           |  ELSE 1.0e0 - (${erfcChain("az")}) / 2.0e0 END) * 1e9
           |  + 0.5e0) / 1e9)""".stripMargin))
      .select(col("experiment_id"), col("k_arms"), col("n_total"),
        col("h_stat"), col("df"), col("p_value"))
      .orderBy("experiment_id")
  }

  /** DuckDB replay of [[kruskalExperiments]]: same grain, cumulative
    * total count, decimal 2R sums, variant-ordered `list_reduce` fold
    * (left fold ≡ Spark's `aggregate` from 0.0 — IEEE-identical), WH
    * cube-root lattice and erfc chain. */
  def kruskalExperimentsSql(): String =
    s"""WITH g AS (
       |  SELECT json_extract_string(props, '$$.k') AS experiment_id,
       |    event_type AS variant, value, count(*)::BIGINT AS cnt
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |    AND value IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |vg AS (
       |  SELECT experiment_id, value,
       |    CAST(sum(cnt) AS BIGINT) AS cnt_all
       |  FROM g GROUP BY 1, 2),
       |cw AS (
       |  SELECT *, COALESCE(sum(cnt_all) OVER (
       |    PARTITION BY experiment_id ORDER BY value
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS cum_excl
       |  FROM vg),
       |ec AS (
       |  SELECT experiment_id, CAST(sum(cnt_all) AS BIGINT) AS n_total,
       |    CAST(sum(${cubeMinus("cnt_all")}) AS DOUBLE) AS tie_sum
       |  FROM vg GROUP BY 1),
       |am AS (
       |  SELECT g.experiment_id, g.variant,
       |    CAST(sum(g.cnt) AS BIGINT) AS n_i,
       |    CAST(sum(CAST(g.cnt AS DECIMAL(18,0))
       |      * CAST(2 * cw.cum_excl + cw.cnt_all + 1 AS DECIMAL(18,0)))
       |    AS DOUBLE) AS two_r
       |  FROM g JOIN cw ON g.experiment_id = cw.experiment_id
       |    AND g.value = cw.value
       |  GROUP BY 1, 2),
       |d2t AS (
       |  SELECT am.experiment_id, am.variant, ec.n_total, ec.tie_sum,
       |    $KwD2 AS d2
       |  FROM am JOIN ec ON am.experiment_id = ec.experiment_id),
       |fe AS (
       |  SELECT experiment_id, any_value(n_total) AS n_total,
       |    any_value(tie_sum) AS tie_sum,
       |    count(*)::BIGINT AS k_arms,
       |    list_reduce(list(CAST(d2 AS DOUBLE) ORDER BY variant),
       |      (a, b) -> a + b) AS ssd
       |  FROM d2t GROUP BY 1),
       |hh AS (
       |  SELECT *, $KwCorr AS corr FROM fe),
       |hv AS (
       |  SELECT experiment_id, k_arms, n_total,
       |    CASE WHEN k_arms >= 2 AND corr > 0.0e0
       |    THEN ($KwH) / corr END AS h_stat
       |  FROM hh),
       |wz AS (
       |  SELECT experiment_id, k_arms, n_total, h_stat,
       |    (k_arms - 1)::BIGINT AS df,
       |    (floor(cbrt(h_stat / CAST(k_arms - 1 AS DOUBLE)) * 1e9
       |      + 0.5e0) / 1e9) AS cb
       |  FROM hv WHERE h_stat IS NOT NULL),
       |zz AS (
       |  SELECT *,
       |    (cb - (1.0e0 - 2.0e0 / (9.0e0 * CAST(df AS DOUBLE))))
       |    / sqrt(2.0e0 / (9.0e0 * CAST(df AS DOUBLE))) AS z
       |  FROM wz),
       |za AS (
       |  SELECT *, abs(z) * 0.7071067811865476e0 AS az FROM zz)
       |SELECT experiment_id, k_arms, n_total, h_stat, df,
       |  (floor((CASE WHEN z >= 0.0e0
       |    THEN (${erfcChain("az")}) / 2.0e0
       |    ELSE 1.0e0 - (${erfcChain("az")}) / 2.0e0 END) * 1e9
       |    + 0.5e0) / 1e9) AS p_value
       |FROM za ORDER BY experiment_id""".stripMargin

  /** DuckDB replay of [[mwuExperiments]]: the same tie-group grain,
    * running control count, decimal 2U/tie sums, continuity-corrected
    * z, erfc-lattice p, and the shared BH tail. */
  def mwuExperimentsSql(alpha: Double = 0.05): String =
    s"""WITH g AS (
       |  SELECT json_extract_string(props, '$$.k') AS experiment_id,
       |    event_type AS variant, value, count(*)::BIGINT AS cnt
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |    AND value IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |ctl AS (
       |  SELECT experiment_id, min(variant) AS control_variant
       |  FROM g GROUP BY 1),
       |mg AS (
       |  SELECT g.experiment_id, g.value,
       |    CAST(sum(CASE WHEN g.variant = ctl.control_variant
       |      THEN g.cnt ELSE 0 END) AS BIGINT) AS cnt_c
       |  FROM g JOIN ctl ON g.experiment_id = ctl.experiment_id
       |  GROUP BY 1, 2),
       |cw AS (
       |  SELECT *, COALESCE(sum(cnt_c) OVER (
       |    PARTITION BY experiment_id ORDER BY value
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS cum_excl
       |  FROM mg),
       |cc AS (
       |  SELECT experiment_id, CAST(sum(cnt_c) AS BIGINT) AS n_c,
       |    CAST(sum(${cubeMinus("cnt_c")}) AS DOUBLE) AS tie_c
       |  FROM mg GROUP BY 1),
       |tr AS (
       |  SELECT g.experiment_id, g.variant, g.cnt, cw.cnt_c,
       |    cw.cum_excl
       |  FROM g
       |  JOIN ctl ON g.experiment_id = ctl.experiment_id
       |  JOIN cw ON g.experiment_id = cw.experiment_id
       |    AND g.value = cw.value
       |  WHERE g.variant <> ctl.control_variant),
       |am AS (
       |  SELECT experiment_id, variant,
       |    CAST(sum(cnt) AS BIGINT) AS n_t,
       |    CAST(sum(CAST(cnt AS DECIMAL(18,0))
       |      * CAST(2 * cum_excl + cnt_c AS DECIMAL(18,0)))
       |    AS DOUBLE) AS two_u,
       |    CAST(sum(${cubeMinus("(cnt_c + cnt)")}
       |      - ${cubeMinus("cnt_c")}) AS DOUBLE) AS tie_t
       |  FROM tr GROUP BY 1, 2),
       |st AS (
       |  SELECT am.experiment_id, am.variant, am.n_t, cc.n_c,
       |    am.two_u, am.tie_t + cc.tie_c AS tie
       |  FROM am JOIN cc ON am.experiment_id = cc.experiment_id),
       |sg AS (
       |  SELECT *, $MwuSig2 AS sig2 FROM st),
       |vu AS (
       |  SELECT *,
       |    CASE WHEN n_t >= 1 AND n_c >= 1 AND sig2 > 0.0e0
       |    THEN two_u / 2.0e0 END AS stat
       |  FROM sg),
       |bz AS (
       |  SELECT experiment_id, variant, stat, sig2, n_t, n_c,
       |    greatest(0.0e0,
       |      abs(stat - CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE)
       |        / 2.0e0)
       |      - 0.5e0) / sqrt(sig2) * 0.7071067811865476e0 AS z
       |  FROM vu WHERE stat IS NOT NULL),
       |bp AS (
       |  SELECT 'mwu_u' AS test, experiment_id, variant, stat,
       |    $fdrP AS p_value
       |  FROM bz),
       |br AS (
       |  SELECT *, count(*) OVER () AS m,
       |    row_number() OVER (ORDER BY p_value, test, experiment_id,
       |      variant) AS rank
       |  FROM bp),
       |${bhTailSql(alpha)}""".stripMargin
}
