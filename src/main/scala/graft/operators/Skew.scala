package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the salting counterpart to
  * [[Metrics.uniqueUsersPerMinuteSalted]]'s two-phase distinct.
  *
  * A hash-partitioned equi-join sends every row of a join key to one
  * reducer; a hot key (a user with 10⁸ events, a null-ish default id)
  * turns that reducer into the straggler that decides job wall-time.
  * Salting splits each fact key across `nSalts` partitions (salt
  * derived from a per-row unique column, so the spread is uniform and
  * deterministic), and replicates the matching dim rows to every salt —
  * the join result is exactly the plain join's, but the hot key's work
  * is spread over `nSalts` reducers.
  *
  * Use when: dim side too big to broadcast AND fact keys are skewed
  * (AQE's skew-join split handles sort-merge skew post-hoc; explicit
  * salting is the plan-level guarantee, and composes with bucketing).
  * Cost: dim side inflated ×nSalts through the shuffle — size nSalts
  * to the skew factor, not higher.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, spreading each fact key over
    * `nSalts` partitions. `saltSource` must be a per-row (or near-)
    * unique fact column so rows of one key spread evenly; the salt is
    * a pure function of it (deterministic across retries — safe under
    * task re-execution, unlike rand()-based salting). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, nSalts: Int = 16): DataFrame = {
    // reserved name, not "_salt": a user column of that name on either
    // side would silently join on the wrong thing
    val salt = "__graft_salt"
    require(!fact.columns.contains(salt) && !dim.columns.contains(salt),
      s"saltedJoin: inputs must not already carry a '$salt' column")
    val saltedFact = fact.withColumn(salt,
      pmod(xxhash64(saltSource), lit(nSalts.toLong)))
    val repDim = dim.withColumn(salt,
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedFact.join(repDim, Seq(key, salt)).drop(salt)
  }

  /** Oracle-checked face of [[saltedJoin]]: enrich each event with its
    * user's total event count (a self-derived dim — the classic "hot
    * user" enrichment shape), then aggregate per event_type. The result
    * is byte-identical to the unsalted join, which is exactly what the
    * DuckDB oracle checks; SkewSpec asserts the salted shuffle plan
    * shape when broadcast is off. */
  def userEnrichedSalted(events: DataFrame, nSalts: Int = 16): DataFrame = {
    val dim = events.groupBy("user_id")
      .agg(count(lit(1)).as("user_total"))
    saltedJoin(events.select("event_id", "user_id", "event_type"),
        dim, "user_id", col("event_id"), nSalts)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("user_total").as("sum_user_total"))
      .orderBy("event_type")
  }

  val userEnrichedSaltedSql: String =
    """WITH dim AS (
      |  SELECT user_id, count(*) AS user_total FROM events GROUP BY 1)
      |SELECT event_type, count(*) AS n_events,
      |  sum(user_total)::BIGINT AS sum_user_total
      |FROM events JOIN dim USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Join-key distribution diagnostics — the measurement that DECIDES
    * whether [[saltedJoin]] (or AQE skew handling) is needed at all,
    * and how to size `nSalts`: one row of exact statistics over the
    * key's per-key row counts. `skew_factor` is max/mean (the
    * straggler multiplier a hash join would see — size `nSalts` to
    * it); `gini` is the exact Gini coefficient of the count
    * distribution (0 = uniform keys, →1 = one key owns the table);
    * `p50_count`/`p99_count` are exact order statistics.
    *
    * Scale shape: one key-keyed count (the same shuffle the join
    * under diagnosis would do), then the per-key count table ranks
    * through [[Analytics.rankByRange]] — range-partitioned local
    * ranks + O(partitions) driver offsets, NO single-partition sort —
    * and everything else is 1-row aggregates/lookups joined by
    * broadcast. All sums/ranks BIGINT-exact; the published ratios are
    * final double divisions written with identical expression shape
    * in both engines (Σ rank·cnt stays < 2⁵³ far past any realistic
    * key cardinality × row count at this profile's inputs; past that,
    * re-enter DECIMAL per SCALE.md §8).
    *
    * Output: `(key, n_rows, n_keys, max_count, max_share,
    * skew_factor, p50_count, p99_count, gini)`. */
  def keySkewProfile(events: DataFrame,
      keyCol: String = "user_id"): DataFrame = {
    val counts = events.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // eager: ranked is consumed three times (moment aggregate + two
    // order-statistic lookups)
    val (ranked, nKeys) = Analytics.rankByRange(counts, Seq("cnt", keyCol),
      eager = true)
    val agg = ranked.agg(
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_count"),
      sum(col("cnt") * col("__rank")).as("acc"))
    // exact order statistics: the count at ascending rank ⌈q·n⌉ —
    // driver-side rank arithmetic mirrors the oracle's ceil() exactly
    val p50r = math.ceil(0.50 * nKeys).toLong
    val p99r = math.ceil(0.99 * nKeys).toLong
    val p50 = ranked.where(col("__rank") === p50r)
      .select(col("cnt").as("p50_count"))
    val p99 = ranked.where(col("__rank") === p99r)
      .select(col("cnt").as("p99_count"))
    agg.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .select(lit(keyCol).as("key"), col("n_rows"), lit(nKeys).as("n_keys"),
        col("max_count"),
        expr("CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE)")
          .as("max_share"),
        expr(s"""CAST(max_count AS DOUBLE) * CAST($nKeys AS DOUBLE)
                | / CAST(n_rows AS DOUBLE)""".stripMargin)
          .as("skew_factor"),
        col("p50_count"), col("p99_count"),
        expr(s"""2.0d * CAST(acc AS DOUBLE)
                | / (CAST($nKeys AS DOUBLE) * CAST(n_rows AS DOUBLE))
                | - (CAST($nKeys AS DOUBLE) + 1.0d)
                |   / CAST($nKeys AS DOUBLE)""".stripMargin)
          .as("gini"))
  }

  /** DuckDB replay of [[keySkewProfile]]: the range-partitioned rank
    * is a plain `row_number` here; identical integer statistics and
    * identically-shaped final divisions. */
  def keySkewProfileSql(keyCol: String = "user_id"): String =
    s"""WITH c AS (
       |  SELECT $keyCol AS k, count(*)::BIGINT AS cnt
       |  FROM events GROUP BY 1),
       |r AS (
       |  SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rk FROM c),
       |a AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS n_keys,
       |    CAST(max(cnt) AS BIGINT) AS max_count,
       |    CAST(sum(cnt * rk) AS BIGINT) AS acc
       |  FROM r),
       |p50 AS (
       |  SELECT r.cnt AS p50_count FROM r, a
       |  WHERE r.rk = CAST(ceil(0.50 * a.n_keys) AS BIGINT)),
       |p99 AS (
       |  SELECT r.cnt AS p99_count FROM r, a
       |  WHERE r.rk = CAST(ceil(0.99 * a.n_keys) AS BIGINT))
       |SELECT '$keyCol' AS key, n_rows, n_keys, max_count,
       |  CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share,
       |  CAST(max_count AS DOUBLE) * CAST(n_keys AS DOUBLE)
       |    / CAST(n_rows AS DOUBLE) AS skew_factor,
       |  p50_count, p99_count,
       |  2.0 * CAST(acc AS DOUBLE)
       |    / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
       |    - (CAST(n_keys AS DOUBLE) + 1.0)
       |      / CAST(n_keys AS DOUBLE) AS gini
       |FROM a, p50, p99""".stripMargin
}
