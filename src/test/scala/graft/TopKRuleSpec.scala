package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TopKRewriteRule optimizer rule: standard row_number+filter
  * queries plan as TopKPerGroup under GraftExtensions, with unchanged
  * results; ineligible shapes stay on the Window operator. */
class TopKRuleSpec extends AnyFunSuite {

  private lazy val ext: SparkSession = {
    TestSpark.spark // shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  private def ranked(s: SparkSession) = {
    import s.implicits._
    Seq(("x", 3, "a"), ("x", 1, "b"), ("x", 2, "c"), ("y", 9, "d"), ("y", 4, "e"))
      .toDF("g", "v", "payload")
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("payload"))))
  }

  test("row_number + rank<=k rewrites to TopKPerGroup with identical results") {
    val q = ranked(ext).where(col("rk") <= 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSet
    // baseline session (no rule) computes the same rows
    val base = ranked(TestSpark.spark).where(col("rk") <= 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSet
    assert(got === base)
    assert(got === Set(("x", 3, 1), ("x", 2, 2), ("y", 9, 1), ("y", 4, 2)))
  }

  test("rank < k form rewrites with k-1") {
    val q = ranked(ext).where(col("rk") < 2)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(q.collect().map(_.getInt(3)).forall(_ == 1))
  }

  test("keep-first dedup (rn <= 1 over a derived key) rewrites to TopKPerGroup") {
    import ext.implicits._
    val ev = Seq(
      (2L, 10L, "2026-01-01 00:00:40", "b"),
      (1L, 10L, "2026-01-01 00:00:30", "a"), // earlier in same minute — kept
      (3L, 10L, "2026-01-01 00:01:10", "c")  // next minute — kept
    ).toDF("event_id", "user_id", "s", "event_type")
      .select(col("event_id"), col("user_id"),
        col("s").cast("timestamp").as("ts"), col("event_type"))
    val q = graft.operators.Analytics.firstEventPerUserMinute(ev)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(q.select("event_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("capPerSource's hash-rank cap rewrites to TopKPerGroup under the extensions") {
    import ext.implicits._
    val docs = (1L to 40L)
      .map(i => (i, s"t$i", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val q = graft.operators.Corpus.capPerSource(docs, k = 3)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      q.queryExecution.executedPlan.toString.take(600))
    // identical rows to the no-rule session
    import TestSpark.spark.implicits.{localSeqToDatasetHolder => baseSeq}
    val baseDocs = baseSeq((1L to 40L)
      .map(i => (i, s"t$i", if (i % 2 == 0) "a" else "b")).toList)
      .toDF("doc_id", "text", "source")
    val base = graft.operators.Corpus.capPerSource(baseDocs, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = q.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === base)
  }

  test("global top-k (no PARTITION BY) stays on Window and returns results") {
    import ext.implicits._
    // regression: the rewrite used to fire with parts=Nil, producing
    // TopKPerGroupExec with ClusteredDistribution(Nil), which throws at
    // planning — a session-wide crash for any global top-k query
    val q = Seq(("a", 3), ("b", 1), ("c", 2)).toDF("payload", "v")
      .withColumn("rk", row_number().over(Window.orderBy(col("v").desc)))
      .where(col("rk") <= 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(600))
    assert(!plan.contains("TopKPerGroup"), plan.take(600))
    assert(q.collect().map(r => (r.getString(0), r.getInt(2))).toSet ===
      Set(("a", 1), ("c", 2)))
  }

  test("ineligible shapes keep the Window operator") {
    import ext.implicits._
    // rank() (not row_number) must NOT rewrite
    val r = Seq(("x", 3), ("x", 1)).toDF("g", "v")
      .withColumn("rk", rank().over(Window.partitionBy("g").orderBy(col("v"))))
      .where(col("rk") <= 1)
    assert(r.queryExecution.executedPlan.toString.contains("Window"))
    // extra filter conjunct must NOT rewrite
    val q2 = ranked(ext).where(col("rk") <= 2 && col("v") > 1)
    assert(q2.queryExecution.executedPlan.toString.contains("Window"))
  }
}
