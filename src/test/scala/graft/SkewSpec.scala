package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted shuffle join: result equivalence with the plain join, and
  * the plan shape that makes it skew-proof. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    // one hot key (90% of rows) + a tail — the shape salting exists for
    val fact = ((1L to 90L).map(i => (i, 7L)) ++ Seq((91L, 1L), (92L, 2L)))
      .toDF("event_id", "user_id")
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "unmatched"))
      .toDF("user_id", "tag")
    (fact, dim)
  }

  test("saltedJoin returns exactly the plain join result") {
    val (fact, dim) = fixture
    val salted = Skew.saltedJoin(fact, dim, "user_id", col("event_id"), 8)
      .select("event_id", "user_id", "tag")
      .as[(Long, Long, String)].collect().sorted.toList
    val plain = fact.join(dim, Seq("user_id")).select("event_id", "user_id", "tag")
      .as[(Long, Long, String)].collect().sorted.toList
    assert(salted === plain)
    assert(salted.length === 92)
  }

  test("fact rows of the hot key spread across all salt partitions") {
    val (fact, _) = fixture
    val salts = fact
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8L)))
      .where(col("user_id") === 7L)
      .select("_salt").distinct().as[Long].collect()
    // 90 rows over 8 salts — every salt bucket should be hit
    assert(salts.length === 8, s"hot key only reached salts ${salts.toList}")
  }

  test("with broadcast off, the join shuffles on (key, salt) — not key alone") {
    val (fact, dim) = fixture
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Skew.saltedJoin(fact, dim, "user_id", col("event_id"), 8)
      q.collect() // finalize AQE
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_salt"), plan.take(800))
      // both children hash-partition on the two-column key
      assert("hashpartitioning\\(user_id#\\d+L, __graft_salt".r
        .findAllIn(plan).length >= 2, plan.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a skewed join partition at runtime (no salting needed)") {
    // the complementary mitigation to explicit salting: for plain
    // shuffle joins, AQE detects an oversized partition post-shuffle
    // and fans it out. Thresholds are lowered so the KB-scale fixture
    // trips the same detection a multi-GB hot key would in production.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.get(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val hot = (1L to 20000L).map(i => (i, 7L)) ++
        (1L to 200L).map(i => (20000L + i, i % 50))
      val fact = hot.toDF("event_id", "user_id")
      val dim = (0L to 50L).map(k => (k, s"t$k")) :+ (7L, "hot")
      val dimDf = dim.toDF("user_id", "tag")
      val q = fact.join(dimDf, Seq("user_id")).groupBy("tag").count()
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        "AQE did not mark any partition skewed:\n" + plan.take(1500))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("keySkewProfile: exact Gini/percentiles/skew-factor on a hand-computed fixture") {
    // keys with counts 1,1,2,6 (ascending): n_rows=10, n_keys=4,
    // Σ rank·cnt = 1+2+6+24 = 33, Gini = 2·33/(4·10) − 5/4 = 0.4,
    // p50 = cnt at rank ⌈2⌉ = 1, p99 = cnt at rank ⌈3.96⌉ = 6,
    // skew_factor = 6/(10/4) = 2.4
    val ev = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")
    val got = Skew.keySkewProfile(ev)
      .as[(String, Long, Long, Long, Double, Double, Long, Long, Double)]
      .collect().head
    // gini replicated with the operator's exact expression shape
    // (bit-identical IEEE, not an approximate compare)
    val gini = 2.0 * 33.0 / (4.0 * 10.0) - (4.0 + 1.0) / 4.0
    assert(got === (("user_id", 10L, 4L, 6L, 0.6, 2.4, 1L, 6L, gini)))
    assert(math.abs(gini - 0.4) < 1e-15)
  }

  test("keySkewProfile ranks per range partition, never in one global window") {
    val ev = (1L to 500L).map(i => (i, i % 37)).toDF("event_id", "user_id")
    val df = Skew.keySkewProfile(ev)
    val plan = df.queryExecution.executedPlan.toString
    // the rank must come from the __pid-partitioned local window (the
    // rankByRange shape); an unpartitioned window would drag the whole
    // per-key count table onto one task at scale
    assert(plan.contains("windowspecdefinition(__pid"),
      "rank window is not partitioned by the range-partition id:\n" +
        plan.take(1200))
    assert(df.count() === 1)
  }
}
