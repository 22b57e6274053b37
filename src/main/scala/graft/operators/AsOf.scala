package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-match) join — an operator Spark has no native
  * form of, composed scalably from a union + running `last` window
  * (preference order (a) of the custom-operator ladder: built-ins
  * express the semantics, so no custom plan node is needed).
  *
  * Instead of a per-left-row subquery or a range join (both quadratic
  * in the worst case), both sides are unioned into one stream tagged
  * left/right, hash-partitioned by key, and sorted by (time, tag) —
  * one shuffle, one sort, linear scan: for every left row the running
  * `last(right_payload, ignoreNulls)` is exactly the most recent right
  * row with `right.ts <= left.ts` (the tag orders right before left on
  * equal timestamps, giving the inclusive bound). This is the standard
  * distributed sort-merge as-of shape used by time-series stores. */
object AsOf {

  /** Generic as-of: for each row of `left`, attach `payload` from the
    * latest `right` row with the same `key` and `rightTs <= leftTs`.
    * Rows with no prior match get null payload (left-asof semantics).
    * Both inputs must share the `key` column name; output = left
    * columns + `payload` (renamed `asof_<payload>`). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: String): DataFrame = {
    val l = left.withColumn("__t", col(leftTs)).withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(payload).dataType))
    val r = right.select(col(key), col(rightTs).as("__t"),
        col(payload).as("__p"))
      .withColumn("__tag", lit(0))
    val lCols = left.columns
    // align schemas: right side carries nulls for left-only columns
    val rAligned = lCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((lCols.map(col) :+ col("__t") :+ col("__tag") :+ col("__p")).toIndexedSeq: _*)
    val unioned = l.select((lCols.map(col) :+ col("__t") :+ col("__tag") :+ col("__p")).toIndexedSeq: _*)
      .unionByName(rAligned)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$payload", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select((lCols.map(col) :+ col(s"asof_$payload")).toIndexedSeq: _*)
  }

  /** The query face: for each 'purchase' event, the same user's most
    * recent 'click' event at or before it (inner as-of — purchases
    * with no prior click are dropped). */
  def purchaseAfterClick(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asofJoin(purchases, clicks, "user_id", "ts", "ts", "click_id")
      .where(col("asof_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_click_id").as("prior_click_id"))
      .orderBy("purchase_id")
  }

  /** Same query through the native sort-merge as-of operator
    * ([[graft.plans.AsOfJoinExec]]) — no union materialization, no
    * window state machine; same oracle. */
  def purchaseAfterClickNative(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.plans.NativeAsOf
      .asofJoin(purchases, clicks, "user_id", "ts", "ts", "click_id",
        "asof_click_id")
      .where(col("asof_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_click_id").as("prior_click_id"))
      .orderBy("purchase_id")
  }

  val purchaseAfterClickSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  c.event_id AS prior_click_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY purchase_id""".stripMargin
}
