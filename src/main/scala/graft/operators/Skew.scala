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
}
