package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-maintenance operations for a store without a lakehouse
  * format: plain Spark has no `MERGE INTO`, but the upsert a metrics
  * or corpus snapshot needs is expressible as one anti-join —
  * `updates ∪ (base ⟕̸ updates)` (take every update row; keep base rows
  * whose key has no update). Writing the result as a new snapshot
  * directory and flipping a pointer gives atomic replace; at scale the
  * anti-join broadcasts when the update batch is small (the common
  * case: deltas are tiny next to the store) and AQE decides otherwise
  * when it is not.
  */
object Maintenance {

  /** MERGE-shaped upsert: rows of `updates` win on key collision,
    * unmatched `base` rows survive, new keys insert. Column sets must
    * match (`unionByName`). One anti-join, no full-outer coalesce of
    * every column. */
  def upsert(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    updates.unionByName(base.join(updates.select(keys.map(col): _*),
      keys, "left_anti"))

  /** Oracle-checked MERGE demo over `orders`: a deterministic delta
    * batch (every 7th key re-prioritized = UPDATE; every 1000th key
    * mirrored to a negative key = INSERT) merged into the snapshot,
    * then summarized per priority. Exercises both MERGE arms plus the
    * untouched-survivor path in one result. */
  def snapshotUpsert(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_orderkey"), col("o_orderpriority"),
      col("o_totalprice"))
    val upd = o.where(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderpriority", lit("X-UPSERTED"))
      .unionByName(o.where(col("o_orderkey") % 1000 === 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("o_orderpriority", lit("X-NEW")))
    upsert(o, upd, Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val snapshotUpsertSql: String =
    """WITH upd AS (
      |  SELECT o_orderkey, 'X-UPSERTED' AS o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT -o_orderkey, 'X-NEW', o_totalprice
      |  FROM orders WHERE o_orderkey % 1000 = 0),
      |merged AS (
      |  SELECT * FROM upd
      |  UNION ALL
      |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
      |SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin
}
