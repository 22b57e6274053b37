package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed co-located joins: both fact tables written bucketed by the
  * join key join WITHOUT any Exchange in the plan — the storage-side
  * pre-partitioning that replaces the shuffle at 100 TB. Broadcast is
  * disabled in-test because the fixture tables are tiny; at real scale
  * neither fact side would broadcast. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-bucketing fact-fact join plans with no shuffle") {
    val d = TestSpark.Sf0001
    Tables.writeBucketed(Tables.lineitem(spark, d)
      .select("l_orderkey", "l_quantity"), "li_bucketed", "l_orderkey", 8)
    Tables.writeBucketed(Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority")),
      "ord_bucketed", "o_orderkey", 8)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.collect().length ===
        Tables.lineitem(spark, d).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(500))
      assert(plan.contains("SelectedBucketsCount"),
        "scan not bucket-aware: " + plan.take(500))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("materialized band index: probe join shuffles only the batch side") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    graft.operators.Dedup.writeBandIndex(
      docs.where(col("doc_id") % 5 =!= 0), "band_index_t", buckets = 8)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      graft.functions.MinHashFunctions.register(spark)
      val batchBands = docs.where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("new_id"),
          split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 4)
        .select(col("new_id"),
          explode(expr("minhash_bands(minhash_sig(toks, 4, 64), 16)"))
            .as("band_hash"))
      val probed = spark.table("band_index_t")
        .join(batchBands, "band_hash")
      assert(probed.count() > 0, "implanted dups should collide")
      // exactly ONE exchange: the batch side. The index scan is
      // bucket-clustered on band_hash and must not shuffle.
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        "index scan not bucket-aware: " + plan.take(500))
      val exchanges = "(?<!Broadcast)Exchange".r
        .findAllIn(plan.replace("BroadcastExchange", "BX")).length
      assert(exchanges === 1,
        s"expected one probe-side shuffle, got $exchanges:\n${plan.take(1500)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS band_index_t")
    }
  }

  test("materialized shingle index: exact-substr probe shuffles only the batch side, results ≡ incremental") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    graft.operators.Dedup.writeShingleIndex(corpus, "shingle_index_t",
      l = 16, buckets = 8)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) =>
        conf.set(k, if (k.endsWith("partitions")) "8" else "-1") }
      graft.functions.Registry.ensure(spark)
      // the operator's probe join shape: batch shingle counts (their
      // aggregation exchange doubles as the join clustering — which
      // requires shuffle.partitions == bucket count, the alignment
      // discipline a production probe job sets; misaligned counts add
      // one batch-side re-exchange, never an index-side one) against
      // the bucket-clustered index scan
      val dfB = batch.where(col("text").isNotNull)
        .select(posexplode(expr("token_shingle_hashes(text, 16)")))
        .toDF("pos", "sh")
        .groupBy(col("sh")).agg(count(lit(1)).as("df_b"))
      val probed = dfB.join(spark.table("shingle_index_t"), Seq("sh"), "left")
      probed.count() // materialize
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        "index scan not bucket-aware: " + plan.take(500))
      // exactly ONE non-broadcast exchange: the batch aggregate's,
      // which the join reuses; the index side must not shuffle
      val exchanges = "(?<!Broadcast)Exchange".r
        .findAllIn(plan.replace("BroadcastExchange", "BX")).length
      assert(exchanges === 1,
        s"expected one batch-side shuffle, got $exchanges:\n${plan.take(1500)}")
      // value parity: the indexed probe computes exactly what the
      // in-memory incremental face computes
      val viaIndex = graft.operators.Dedup
        .exactSubstrIndexed(spark, "shingle_index_t", batch)
        .collect().map(_.toSeq).toSeq
      val inMem = graft.operators.Dedup
        .exactSubstrIncremental(corpus, batch)
        .collect().map(_.toSeq).toSeq
      assert(viaIndex === inMem)
      assert(viaIndex.nonEmpty, "fixture dups should surface spans")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS shingle_index_t")
    }
  }

  test("materialized IVF index: large-batch probe shuffles only the query side") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    Similarity.writeIvfIndex(emb, "ivf_index_t", buckets = 8)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      // force the non-broadcast regime the indexed path is built for
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val queries = emb.where(pmod(col("vec_id"), lit(100)) === 0)
      val indexed = Similarity.knnIvfIndexed(spark, "ivf_index_t", queries)
      val direct = Similarity.knnIvf(emb)
      // identical results to the from-scratch plan at equal parameters
      assert(indexed.collect().toSet === direct.collect().toSet)
      // AdaptiveSparkPlan prints Final AND Initial sections — count
      // exchanges in the final plan only
      val plan = indexed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SelectedBucketsCount"),
        "index scan not bucket-aware: " + plan.take(500))
      // exact budget: probe-side hash (into the bucket scheme) + top-k
      // window hash + final ORDER BY range = 3. The index side adds a
      // 4th if it ever starts shuffling.
      val exchanges = "(?<!Broadcast)Exchange".r
        .findAllIn(plan.replace("BroadcastExchange", "BX")).length
      assert(exchanges === 3,
        s"expected 3 non-index exchanges, got $exchanges:\n${plan.take(2000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS ivf_index_t")
    }
  }
}
