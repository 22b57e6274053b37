package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{MetricsStore, StreamingMetrics}

/** Streaming semantics per SURVEY.md §5.4: update-mode incremental
  * results after each addData+processAllAvailable, including a late
  * event folding into an already-seen minute (the reference accepts
  * late data forever — no watermark, order-insensitive merges). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(uid: String, exp: String, variant: String, t: String) =
    LogEvent(uid, exp, variant, java.sql.Timestamp.valueOf(t))

  test("pipeline fan-out: counters and sets update per micro-batch; late events fold into their original minute") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val store = new MetricsStore
    val queries = StreamingMetrics.startPipeline(input.toDS(), store)
    try {
      input.addData(
        ev("u1", "e1", "1", "2026-08-12 10:15:03"),
        ev("u1", "e1", "1", "2026-08-12 10:15:59"),
        ev("u2", "e1", "2", "2026-08-12 10:16:00"))
      queries.foreach(_.processAllAvailable())
      assert(store.counter("visitCounter_2026_08_12T10_15") === 2L)
      assert(store.counter("visitCounter_2026_08_12T10_16") === 1L)
      assert(store.scard("set_dthr_2026_08_12T10_15") === 1L)

      // late event for 10:15 arrives after 10:16 was seen; u1 also
      // crosses into variant "2" (overlap membership)
      input.addData(
        ev("u3", "e2", "2", "2026-08-12 10:15:30"),
        ev("u1", "e1", "2", "2026-08-12 10:16:20"))
      queries.foreach(_.processAllAvailable())
      assert(store.counter("visitCounter_2026_08_12T10_15") === 3L)
      assert(store.scard("set_dthr_2026_08_12T10_15") === 2L)
      assert(store.scard("set_var_1") === 1L)
      assert(store.scard("set_var_2") === 3L)
      assert(store.counter("hll_dthr_2026_08_12T10_15") === 2L)

      // Q4 read shape over the store: variant overlap via set intersection
      assert(store.overlap("set_var_") === Seq(("1", "2", 1L)))
      // Q1 read shape: zero-filled closed minutes
      val series = store.timeseries("visitCounter",
        java.time.LocalDateTime.of(2026, 8, 12, 10, 17), lastMinutes = 3)
      assert(series === Seq(
        ("2026_08_12T10_14", 0L),
        ("2026_08_12T10_15", 3L),
        ("2026_08_12T10_16", 2L)))
    } finally queries.foreach(_.stop())
  }

  test("pipeline writes only through the KeyValueMetricsSink trait — a foreign sink is a drop-in") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // a stand-in for a real Redis client: records raw verb calls, shares
    // no code with MetricsStore — proves the boundary carries everything
    // the pipeline emits
    class RecordingSink extends graft.streaming.KeyValueMetricsSink {
      val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long)]
      def incrBy(key: String, n: Long): Unit = { calls.add(("INCRBY", key, n)); () }
      def put(key: String, v: Long): Unit = { calls.add(("SET", key, v)); () }
      def sadd(key: String, members: Iterable[String]): Unit = {
        calls.add(("SADD", key, members.size.toLong)); ()
      }
    }
    val input = MemoryStream[LogEvent]
    val sink = new RecordingSink
    val queries = StreamingMetrics.startPipeline(input.toDS(), sink)
    try {
      input.addData(
        ev("u1", "e1", "1", "2026-08-12 10:15:03"),
        ev("u2", "e1", "2", "2026-08-12 10:15:30"))
      queries.foreach(_.processAllAvailable())
      import scala.jdk.CollectionConverters._
      val byVerb = sink.calls.asScala.toSeq.groupBy(_._1)
      // INCRBY carries the per-batch partial count for the minute
      assert(byVerb("INCRBY") === Seq(("INCRBY", "visitCounter_2026_08_12T10_15", 2L)))
      // every set family reached the sink via SADD
      val saddKeys = byVerb("SADD").map(_._2).toSet
      assert(saddKeys === Set("set_dthr_2026_08_12T10_15",
        "set_var_1", "set_var_2", "set_experiments_2026_08_12T10_15"))
      // the HLL rollup arrives as a materialized upsert
      assert(byVerb("SET") === Seq(("SET", "hll_dthr_2026_08_12T10_15", 2L)))
    } finally queries.foreach(_.stop())
  }

  test("watermarked variant (documented deviation) still folds in-window late data") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val store = new MetricsStore
    val queries = StreamingMetrics.startPipeline(input.toDS(), store,
      watermark = Some("10 minutes"))
    try {
      input.addData(ev("u1", "e1", "1", "2026-08-12 10:16:00"))
      queries.foreach(_.processAllAvailable())
      // late by 1 minute — inside the 10-minute watermark → accepted
      input.addData(ev("u2", "e1", "1", "2026-08-12 10:15:00"))
      queries.foreach(_.processAllAvailable())
      assert(store.counter("visitCounter_2026_08_12T10_15") === 1L)
      assert(store.counter("visitCounter_2026_08_12T10_16") === 1L)
    } finally queries.foreach(_.stop())
  }

  test("streaming exact dedup drops repeated keys across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    input.addData(
      ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u1", "e1", "1", "2026-08-12 10:15:03"), // dup in-batch
      ev("u2", "e1", "2", "2026-08-12 10:16:00"))
    val deduped = StreamingMetrics.dedupExactStream(
      input.toDS().toDF(), Seq("uid", "variant"),
      watermark = Some(("timestamp", "1 hour")))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream_t").start()
    q.processAllAvailable()
    input.addData(ev("u1", "e1", "1", "2026-08-12 10:17:00")) // dup across batches
    q.processAllAvailable()
    val rows = spark.table("dedup_stream_t").collect()
    assert(rows.length === 2, rows.mkString("; "))
    q.stop()
  }

  test("streaming theta sketches serve exact overlap in the raw-hash regime") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val store = new MetricsStore
    val q = StreamingMetrics.startVariantSketches(
      input.toDS(), store, "theta_var_t")
    // variant 1: u1 u2 u3 ; variant 2: u2 u3 u4 — overlap 2, split
    // across two micro-batches so the sketch state must accumulate
    input.addData(ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u2", "e1", "1", "2026-08-12 10:15:10"),
      ev("u2", "e1", "2", "2026-08-12 10:15:20"))
    q.processAllAvailable()
    input.addData(ev("u3", "e1", "1", "2026-08-12 10:16:00"),
      ev("u3", "e1", "2", "2026-08-12 10:16:05"),
      ev("u4", "e1", "2", "2026-08-12 10:16:10"))
    q.processAllAvailable()
    assert(store.overlapApprox("theta_var_") === Seq(("1", "2", 2L)))
    q.stop()
  }

  test("streaming store materialization folds micro-batches ≡ one-shot batch store") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val b1 = Seq(ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u2", "e1", "2", "2026-08-12 10:15:30"))
    val b2 = Seq(ev("u1", "e2", "1", "2026-08-12 10:16:00"),
      ev("u3", "e1", "1", "2026-08-12 10:15:40"))
    val input = MemoryStream[LogEvent]
    val mat = new StreamingMetrics.StoreMaterializer
    val q = StreamingMetrics.startStoreMaterialization(
      input.toDS(), mat, "store_mat_t")
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    def values(df: org.apache.spark.sql.DataFrame) = df
      .select("metric", "dim", "window_minute", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val streamed = values(mat.snapshot.get)
    val oneShot = values(graft.store.MetricsTables.materialize(
      (b1 ++ b2).toDS().toDF()
        .withColumnRenamed("experimentId", "experiment_id")))
    assert(streamed === oneShot)
    q.stop()
  }

  test("applyBatchOnce makes INCRBY effectively-once under batch redelivery") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val store = new MetricsStore
    val input = MemoryStream[LogEvent]
    input.addData(ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u2", "e1", "2", "2026-08-12 10:15:30"))
    val dir = java.nio.file.Files.createTempDirectory("idem_ckpt").toString
    val q = StreamingMetrics.startVisitsIdempotent(
      input.toDS(), store, dir, "visits_idem_t")
    q.processAllAvailable()
    val key = "visitCounter_2026_08_12T10_15"
    assert(store.counter(key) === 2L)
    // simulate at-least-once redelivery of batch 0: the guard must skip
    val reRan = store.applyBatchOnce("visits_idem_t", 0L) {
      store.incrBy(key, 2L)
    }
    assert(!reRan && store.counter(key) === 2L, "redelivered batch double-counted")
    // a FAILED batch releases its marker and retries
    intercept[RuntimeException] {
      store.applyBatchOnce("visits_idem_t", 99L)(throw new RuntimeException("boom"))
    }
    assert(store.applyBatchOnce("visits_idem_t", 99L) { store.incrBy(key, 1L) })
    assert(store.counter(key) === 3L)
    q.stop()
  }

  test("streaming incremental dedup: later near-dups rejected, index holds only accepted docs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val input = MemoryStream[(Long, String)]
    val store = new StreamingMetrics.DedupIndexStore
    val q = StreamingMetrics.startIncrementalDedup(
      input.toDS().toDF("doc_id", "text"), store, "inc_dedup_t")
    // batch 1: two distinct originals
    input.addData((10L, base + "one two three four"),
      (20L, "un deux trois quatre cinq six sept huit neuf dix " * 5))
    q.processAllAvailable()
    assert(store.dups.isEmpty && store.sigs.keySet === Set(10L, 20L))
    // batch 2: a near-dup of doc 10 (one token changed), plus a novel doc
    input.addData((30L, base + "one two three FIVE"),
      (40L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 5))
    q.processAllAvailable()
    assert(store.dups.toMap === Map(30L -> 10L))
    // the rejected doc never entered the index
    assert(store.sigs.keySet === Set(10L, 20L, 40L))
    assert(!store.bands.values.exists(_.contains(30L)))
    q.stop()
  }

  test("streamed MLM examples equal the batch construction under any batch slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docsData = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta " * 4),
      (2L, "one two three four five six seven eight nine ten " * 3),
      (3L, "red orange yellow green blue indigo violet " * 5))
      .map { case (id, t) => (id, t.trim) }
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Corpus
      .mlmMaskingStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("mlm_stream_t").start()
    try {
      // slice the corpus across two micro-batches
      input.addData(docsData(0))
      q.processAllAvailable()
      input.addData(docsData(1), docsData(2))
      q.processAllAvailable()
      val streamed = spark.table("mlm_stream_t")
        .as[(Long, Long, Long, Long, Long, Long, String, String)]
        .collect().toSet
      val batch = graft.operators.Corpus
        .mlmMasking(docsData.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, Long, String, String)]
        .collect().toSet
      // content-hash determinism: examples are byte-identical however
      // the stream was sliced
      assert(streamed === batch)
      assert(streamed.map(_._1) === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streamed variant-lift moments equal the one-shot batch aggregate under any slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // (event_id, event_type, value, props) — two experiments, three arms
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq("a", "b", "c")(i % 3),
        (i % 7).toDouble + 0.25, s"""{"k":"e${i % 2}"}""")
    }
    val input = MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.StreamingMetrics.startVariantLift(
      input.toDS().toDF("event_id", "event_type", "value", "props"),
      "variant_lift_t")
    try {
      // three uneven micro-batch cuts
      input.addData(rows.take(7))
      q.processAllAvailable()
      input.addData(rows.slice(7, 40))
      q.processAllAvailable()
      input.addData(rows.drop(40))
      q.processAllAvailable()
      val streamed = spark.table("variant_lift_t")
        .as[(String, String, Long, Double, Double)].collect().toSet
      val batch = rows.toDF("event_id", "event_type", "value", "props")
        .selectExpr("get_json_object(props, '$.k') AS experiment_id",
          "event_type AS variant", "value")
        .groupBy("experiment_id", "variant")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.expr(
            "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("s1"),
          org.apache.spark.sql.functions.expr(
            "CAST(sum(CAST(value * value AS DECIMAL(20,4))) AS DOUBLE)")
            .as("s2"))
        .as[(String, String, Long, Double, Double)].collect().toSet
      // decimal moments are algebraic: the streamed state is
      // bit-identical to the one-shot aggregate, any slicing
      assert(streamed === batch)
      assert(streamed.map(t => (t._1, t._2)).size === 6)
    } finally q.stop()
  }

  test("streamed SFT examples equal the batch construction under any batch slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docsData = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta " * 4),
      (2L, "one two three four five six seven eight nine ten " * 3),
      (3L, "red orange yellow green blue indigo violet " * 5))
      .map { case (id, t) => (id, t.trim) }
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Corpus
      .sftExamplesStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sft_stream_t").start()
    try {
      input.addData(docsData(0))
      q.processAllAvailable()
      input.addData(docsData(1), docsData(2))
      q.processAllAvailable()
      val streamed = spark.table("sft_stream_t")
        .as[(Long, Long, Long, Long, String, String)].collect().toSet
      val batch = graft.operators.Corpus
        .sftExamples(docsData.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, String, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // mask arithmetic: template adds exactly 2 untrained tokens
      streamed.foreach { case (_, np, nc, nt, _, _) =>
        assert(nt === np + nc + 2)
      }
    } finally q.stop()
  }

  test("streamed contrastive views equal the batch construction under any batch slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docsData = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta " * 4),
      (2L, "one two three four five six seven eight nine ten " * 3),
      (3L, "red orange yellow green blue indigo violet " * 5))
      .map { case (id, t) => (id, t.trim) }
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Corpus
      .contrastiveViewsStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("cv_stream_t").start()
    try {
      input.addData(docsData(0))
      q.processAllAvailable()
      input.addData(docsData(1), docsData(2))
      q.processAllAvailable()
      val streamed = spark.table("cv_stream_t")
        .as[(Long, Long, Long, Long, Long, String, String)].collect().toSet
      val batch = graft.operators.Corpus
        .contrastiveViews(docsData.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, String, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sliding-window visits update all covering windows each micro-batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val q = StreamingMetrics.slidingVisitsStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sliding_stream_t").start()
    try {
      input.addData(ev("u1", "e1", "1", "2026-08-12 10:16:00"))
      q.processAllAvailable()
      val first = spark.table("sliding_stream_t")
        .as[(String, Long)].collect().toSet
      // one event → exactly its 5 covering windows, one visit each
      assert(first === (12 to 16).map(m => (f"2026_08_12T10_$m%02d", 1L)).toSet)
      // a second event in the same minute re-emits all 5 rows updated
      input.addData(ev("u2", "e1", "1", "2026-08-12 10:16:30"))
      q.processAllAvailable()
      val updated = spark.table("sliding_stream_t")
        .as[(String, Long)].collect().filter(_._2 == 2L).map(_._1).toSet
      assert(updated === (12 to 16).map(m => f"2026_08_12T10_$m%02d").toSet)
    } finally q.stop()
  }

  test("rolling actives stream dedups a user across batches within each window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val q = StreamingMetrics.rollingActivesStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("rolling_stream_t").start()
    try {
      input.addData(ev("u1", "e1", "1", "2026-08-12 10:16:00"))
      q.processAllAvailable()
      // same user again in a later micro-batch, same minute — the
      // sketch state must not double-count it
      input.addData(ev("u1", "e1", "1", "2026-08-12 10:16:30"))
      q.processAllAvailable()
      val latest = spark.table("rolling_stream_t")
        .groupBy("window_start")
        .agg(org.apache.spark.sql.functions.max("active_users").as("au"))
        .as[(String, Long)].collect().toMap
      assert(latest.keySet === (12 to 16).map(m => f"2026_08_12T10_$m%02d").toSet)
      assert(latest.values.forall(_ === 1L), latest.toString)
    } finally q.stop()
  }

  test("streaming sessionization emits closed session windows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    input.addData(
      ev("u1", "e1", "1", "2026-08-12 10:00:00"),
      ev("u1", "e1", "1", "2026-08-12 10:10:00"), // same session (gap 30m)
      ev("u1", "e1", "1", "2026-08-12 11:30:00"), // new session
      ev("u2", "e1", "2", "2026-08-12 10:05:00"),
      // advance the watermark far enough to close every session above
      ev("wm", "e1", "1", "2026-08-12 23:00:00"))
    val q = StreamingMetrics.startSessionization(input.toDS(), "sessions_t",
      gapSeconds = 1800, watermark = "1 minute")
    q.processAllAvailable()
    val rows = spark.table("sessions_t").collect()
      .map(r => (r.getString(0), r.getLong(3)))
    val u1 = rows.filter(_._1 == "u1").map(_._2).sorted.toSeq
    assert(u1 === Seq(1L, 2L), rows.mkString("; "))
    assert(rows.count(_._1 == "u2") === 1)
    q.stop()
  }

  test("stream-static enrichment decorates events with broadcast dimension data") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val dim = Seq(("1", "control"), ("2", "treatment")).toDF("variant", "arm")
    val q = StreamingMetrics.enrichStream(input.toDS().toDF(), dim, Seq("variant"))
      .select("uid", "variant", "arm")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_t").start()
    input.addData(
      ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u2", "e1", "9", "2026-08-12 10:15:04")) // no dim row → null arm
    q.processAllAvailable()
    val rows = spark.table("enrich_t").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(rows === Map("u1" -> "control", "u2" -> null))
    q.stop()
  }

  test("stream-stream attribution joins purchases to in-horizon clicks only") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    val joined = StreamingMetrics.attributionStream(
      clicks.toDS().toDF("user_id", "event_id", "ts"),
      purchases.toDS().toDF("user_id", "event_id", "ts"),
      horizon = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_t").start()
    clicks.addData(
      (1L, 100L, ts("2026-08-12 10:00:00")), // in horizon of purchase @10:20
      (1L, 101L, ts("2026-08-12 09:30:00")), // too old (50 min before)
      (2L, 102L, ts("2026-08-12 10:15:00"))) // other user
    purchases.addData((1L, 900L, ts("2026-08-12 10:20:00")))
    q.processAllAvailable()
    val rows = spark.table("attrib_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet === Set((900L, 1L, 100L)), rows.mkString("; "))
    q.stop()
  }

  test("checkpointed restart resumes from committed offsets — no double-counting") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    val store = new MetricsStore
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    input.addData(
      ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u2", "e1", "1", "2026-08-12 10:15:40"))
    val q1 = StreamingMetrics.startVisitsCheckpointed(
      input.toDS(), store, ckpt, "visits_ckpt_a")
    q1.processAllAvailable(); q1.stop()
    assert(store.counter("visitCounter_2026_08_12T10_15") === 2L)

    // restart from the SAME checkpoint with one new event: the first
    // batch's offsets are committed, so only the new event is delivered
    // — a replay would leave the counter at 5, not 3
    input.addData(ev("u3", "e1", "1", "2026-08-12 10:15:55"))
    val q2 = StreamingMetrics.startVisitsCheckpointed(
      input.toDS(), store, ckpt, "visits_ckpt_b")
    q2.processAllAvailable(); q2.stop()
    assert(store.counter("visitCounter_2026_08_12T10_15") === 3L)
  }

  test("file-source E2E: JSON files drive the full pipeline; checkpointed restart skips processed files") {
    import spark.implicits._
    // the source boundary the sandbox can exercise: the reference reads
    // Pub/Sub JSON strings (S1); a file stream delivers the same wire
    // format through the same parse (P1) into the same pipeline
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_fs_ckpt").toString
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("graft_stage", ".json")
      java.nio.file.Files.write(tmp,
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // atomic move so the source never lists a half-written file
      java.nio.file.Files.move(tmp, srcDir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def wire(uid: String, exp: String, variant: String, iso: String) =
      s"""{"uid":"$uid","experiment_id":"$exp","variant":"$variant","timestamp":"$iso"}"""
    def fileEvents = {
      val raw = spark.readStream.text(srcDir.toString)
      graft.sources.Tables.parseJsonEvents(raw)
        .withColumnRenamed(LogEvent.ExperimentId, "experimentId")
        .as[LogEvent]
    }

    writeFile("batch1.json", Seq(
      wire("u1", "e1", "1", "2026-08-12T10:15:03Z"),
      wire("u2", "e1", "2", "2026-08-12T10:15:30Z"),
      """not json — must be dropped, not crash the stream""",
      wire("u1", "e2", "1", "2026-08-12T10:16:01Z")))

    // full fan-out over the file source (no checkpoint: fresh read)
    val store = new MetricsStore
    val queries = StreamingMetrics.startPipeline(fileEvents, store)
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())
    assert(store.counter("visitCounter_2026_08_12T10_15") === 2L)
    assert(store.counter("visitCounter_2026_08_12T10_16") === 1L)
    assert(store.scard("set_dthr_2026_08_12T10_15") === 2L)
    assert(store.scard("set_experiments_2026_08_12T10_16") === 1L)

    // checkpointed restart across a file boundary: file1's offsets are
    // committed, so the restarted query delivers ONLY file2 — the
    // INCRBY counter proves no re-delivery (a replay would double it)
    val ckptStore = new MetricsStore
    val q1 = StreamingMetrics.startVisitsCheckpointed(
      fileEvents, ckptStore, ckptDir, "file_visits_a")
    q1.processAllAvailable(); q1.stop()
    assert(ckptStore.counter("visitCounter_2026_08_12T10_15") === 2L)

    writeFile("batch2.json", Seq(
      wire("u3", "e1", "1", "2026-08-12T10:15:55Z")))
    val q2 = StreamingMetrics.startVisitsCheckpointed(
      fileEvents, ckptStore, ckptDir, "file_visits_b")
    q2.processAllAvailable(); q2.stop()
    assert(ckptStore.counter("visitCounter_2026_08_12T10_15") === 3L)
    assert(ckptStore.counter("visitCounter_2026_08_12T10_16") === 1L)
  }

  test("flatMapGroupsWithState exact uniques: state accumulates across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[LogEvent]
    // batch 1: two events, one uid dup within the minute
    input.addData(
      ev("u1", "e1", "1", "2026-08-12 10:15:03"),
      ev("u1", "e1", "1", "2026-08-12 10:15:40"),
      ev("u2", "e1", "2", "2026-08-12 10:16:01"))
    val q = StreamingMetrics.startExactUniques(input.toDS(), "exact_uniques_t")
    q.processAllAvailable()
    val afterBatch1 = spark.table("exact_uniques_t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterBatch1("set_dthr_2026_08_12T10_15") === 1L)
    assert(afterBatch1("set_dthr_2026_08_12T10_16") === 1L)
    q.stop()

    // batch 2 (new query over same stream source continues the state? —
    // memory sink truncates per run, so re-drive with a fresh late row)
    input.addData(ev("u9", "e1", "1", "2026-08-12 10:15:55"))
    val q2 = StreamingMetrics.startExactUniques(input.toDS(), "exact_uniques_t2")
    q2.processAllAvailable()
    val after = spark.table("exact_uniques_t2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("set_dthr_2026_08_12T10_15") === 2L)
    q2.stop()
  }

  test("streaming anomaly z ≡ batch visitsZscore on the closed-minute prefix") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // minutes 10:00-10:16 with deterministic varying counts
    def count(m: Int) = 3 + (m * 7) % 5
    val all = (0 until 17).flatMap { m =>
      (0 until count(m)).map(i =>
        ev(s"u$i", "e1", "1", f"2026-08-12 10:$m%02d:10"))
    }
    val input = MemoryStream[LogEvent]
    val q = StreamingMetrics.startVisitsAnomaly(input.toDS(), "anomaly_t",
      watermark = "2 minutes", lookback = 10, minN = 5)
    try {
      // three ordered chunks; watermark trails 2 min behind max ts
      all.grouped(30).foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("anomaly_t")
        .as[(String, Long, Option[Double])].collect()
        .sortBy(_._1)
      assert(streamed.nonEmpty)
      // every emitted minute matches the batch operator exactly
      val batch = graft.operators.Analytics.visitsZscore(
        all.toDF().withColumnRenamed("timestamp", "ts"),
        lookback = 10, minN = 5)
        .as[(String, Long, Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      streamed.foreach { case (mk, v, z) =>
        val (_, bv, bz) = batch(mk)
        assert(v === bv, mk)
        assert(z === bz, s"$mk: stream $z vs batch $bz")
      }
      // enough history accumulated that some z values are real numbers
      assert(streamed.count(_._3.isDefined) >= 5)
    } finally q.stop()
  }

  test("streaming CUSUM: O(1) state reproduces the recurrence; planted shift alarms across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 12 minutes at the target rate (4/min) with a total OUTAGE at
    // minutes 7-8 (no events at all), then 5 minutes at 12/min
    def count(m: Int) =
      if (m == 7 || m == 8) 0 else if (m < 12) 4 else 12
    val all = (0 until 17).flatMap { m =>
      (0 until count(m)).map(i =>
        ev(s"u$i", "e1", "1", f"2026-08-12 10:$m%02d:10"))
    }
    val input = MemoryStream[LogEvent]
    val q = StreamingMetrics.startVisitsCusum(input.toDS(), "cusum_t",
      targetPerMin = 4, watermark = "2 minutes",
      slackHalf = 1, alarmVisits = 8)
    try {
      all.grouped(25).foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("cusum_t")
        .as[(String, Long, Long, Long, Boolean)].collect().sortBy(_._1)
      assert(streamed.nonEmpty)
      // the event-less outage minutes were zero-filled into the fold
      assert(streamed.exists(r => r._1 == "2026_08_12T10_07" && r._2 == 0L),
        "gap minute missing from the fold")
      assert(streamed.exists(r => r._1 == "2026_08_12T10_08" && r._2 == 0L))
      // driver replay of the recurrence over the same minute series
      var sPos = 0L; var sNeg = 0L
      val expected = streamed.map(_._2).map { v =>
        sPos = math.max(0L, sPos + 2 * v - 2 * 4 - 1)
        sNeg = math.max(0L, sNeg + 2 * 4 - 2 * v - 1)
        (sPos, sNeg, math.max(sPos, sNeg) > 16)
      }
      streamed.zip(expected).foreach { case ((mk, _, p, n, a), (ep, en, ea)) =>
        assert(p === ep, mk); assert(n === en, mk); assert(a === ea, mk)
      }
      // the on-target head never alarms; the outage accumulates real
      // S- (2 minutes at v=0: S- = 7 then 14 — shy of the 16 bar by
      // construction, so the DROP statistic measurably moved); the
      // shifted tail alarms
      assert(!streamed.head._5)
      val at8 = streamed.find(_._1 == "2026_08_12T10_08").get
      assert(at8._4 === 14L, s"outage S- ${at8._4}")
      assert(streamed.exists(_._5), "planted shift never alarmed")
    } finally q.stop()
  }

  test("keyed streaming CUSUM: independent per-(experiment,variant) monitors, state rows = |keys|") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // three arms over 14 minutes: (e1,a) stays on target (4/min);
    // (e1,b) has a 2-minute total outage at minutes 6-7 (ITS gap
    // minutes must zero-fill without touching siblings; S- reaches 14
    // — measurably moved but shy of the 16 bar, the global test's
    // construction); (e2,a) shifts to 12/min from minute 6 and must
    // alarm ALONE
    def cnt(exp: String, vr: String, m: Int): Int = (exp, vr) match {
      case ("e1", "a") => 4
      case ("e1", "b") => if (m == 6 || m == 7) 0 else 4
      case ("e2", "a") => if (m >= 6) 12 else 4
      case _ => 0
    }
    val arms = Seq(("e1", "a"), ("e1", "b"), ("e2", "a"))
    val all = (0 until 14).flatMap { m =>
      arms.flatMap { case (exp, vr) =>
        (0 until cnt(exp, vr, m)).map(i =>
          ev(s"u$i", exp, vr, f"2026-08-12 10:$m%02d:10"))
      }
    }
    val input = MemoryStream[LogEvent]
    val q = StreamingMetrics.startKeyedCusum(input.toDS(), "cusum_keyed_t",
      targetPerMin = 4, watermark = "2 minutes",
      slackHalf = 1, alarmVisits = 8)
    try {
      all.grouped(40).foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("cusum_keyed_t")
        .as[(String, String, String, Long, Long, Long, Boolean)]
        .collect().sortBy(r => (r._1, r._2, r._3))
      assert(streamed.nonEmpty)
      // per-key driver replay of the recurrence over each arm's own
      // minute series — the monitors must not bleed into each other
      arms.foreach { case (exp, vr) =>
        val series = streamed.filter(r => r._1 == exp && r._2 == vr)
        assert(series.nonEmpty, s"no rows for ($exp,$vr)")
        var sPos = 0L; var sNeg = 0L
        series.foreach { case (_, _, mk, v, p, n, a) =>
          sPos = math.max(0L, sPos + 2 * v - 2 * 4 - 1)
          sNeg = math.max(0L, sNeg + 2 * 4 - 2 * v - 1)
          assert(p === sPos, s"($exp,$vr) $mk")
          assert(n === sNeg, s"($exp,$vr) $mk")
          assert(a === (math.max(sPos, sNeg) > 16), s"($exp,$vr) $mk")
        }
      }
      // (e1,b)'s outage minutes zero-filled under ITS key only
      assert(streamed.exists(r =>
        r._1 == "e1" && r._2 == "b" && r._3 == "2026_08_12T10_06" && r._4 == 0L),
        "keyed gap minute missing")
      assert(streamed.filter(r => r._3 == "2026_08_12T10_06" && r._4 == 0L)
        .forall(r => (r._1, r._2) == ("e1", "b")))
      // the outage moved (e1,b)'s OWN drop statistic to 14 — real,
      // independent per-key accumulation that stays shy of the bar
      val bAt7 = streamed.find(r =>
        r._1 == "e1" && r._2 == "b" && r._3 == "2026_08_12T10_07").get
      assert(bAt7._6 === 14L, s"outage S- ${bAt7._6}")
      // alarms are per-key: only the shifted arm fires
      val alarmed = streamed.filter(_._7).map(r => (r._1, r._2)).toSet
      assert(alarmed === Set(("e2", "a")), s"alarm keys $alarmed")
      // O(1) per-key state: the fold operator holds exactly |keys| rows
      val stateRows = q.lastProgress.stateOperators
        .filter(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).sum
      assert(stateRows === arms.size.toLong, s"state rows $stateRows")
    } finally q.stop()
  }

  test("streamed Welch-t readout ≡ batch variant_lift bit-exact under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq("a", "b", "c")(i % 3),
        (i % 7).toDouble + 0.25, s"""{"k":"e${i % 2}"}""")
    }
    val input = MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.StreamingMetrics.startVariantLiftT(
      input.toDS().toDF("event_id", "event_type", "value", "props"),
      "variant_lift_t2")
    implicit val liftEnc: org.apache.spark.sql.Encoder[(String, String,
      Long, Double, String, Double, Double, Option[Double])] =
      org.apache.spark.sql.Encoders.product
    type LiftRow = (String, String, Long, Double, String, Double,
      Double, Option[Double])
    def batchOver(rs: Seq[(Long, String, Double, String)]): Set[LiftRow] =
      graft.operators.Analytics.variantLift(
        rs.toDF("event_id", "event_type", "value", "props"))
        .as[LiftRow].collect().toSet
    try {
      // the readout is end-to-end per micro-batch: after EVERY cut the
      // published view equals the batch face over the events so far
      input.addData(rows.take(11))
      q.processAllAvailable()
      assert(spark.table("variant_lift_t2").as[LiftRow].collect().toSet
        === batchOver(rows.take(11)))
      input.addData(rows.slice(11, 43))
      q.processAllAvailable()
      input.addData(rows.drop(43))
      q.processAllAvailable()
      val streamed = spark.table("variant_lift_t2")
        .as[LiftRow].collect().toSet
      val batch = batchOver(rows)
      // decimal moments are algebraic and the derivation chain is the
      // SAME code (Analytics.liftFromArms): bit-exact, any slicing
      assert(streamed === batch)
      // the t column is populated for non-control arms with n > 1
      assert(streamed.count(_._8.isDefined) >= 2)
    } finally q.stop()
  }

  test("streamed BH-FDR battery ≡ batch fdrExperiments bit-exact under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // values straddling the conversion gate (value > 100) so both the
    // Welch and the chi-square rows carry real signal per arm
    val rows = (0 until 90).map { i =>
      (i.toLong, Seq("a", "b", "c")(i % 3),
        (i % 11).toDouble * 20.0 + 0.25, s"""{"k":"e${i % 2}"}""")
    }
    val input = MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.StreamingMetrics.startFdrExperiments(
      input.toDS().toDF("event_id", "event_type", "value", "props"),
      "fdr_stream")
    implicit val fdrEnc: org.apache.spark.sql.Encoder[(String, String,
      String, Double, Double, Long, Long, Double, Boolean)] =
      org.apache.spark.sql.Encoders.product
    type FdrRow = (String, String, String, Double, Double, Long, Long,
      Double, Boolean)
    def batchOver(rs: Seq[(Long, String, Double, String)]): Set[FdrRow] =
      graft.operators.Analytics.fdrExperiments(
        rs.toDF("event_id", "event_type", "value", "props"))
        .as[FdrRow].collect().toSet
    try {
      input.addData(rows.take(13))
      q.processAllAvailable()
      // after EVERY cut the published battery equals the batch face
      assert(spark.table("fdr_stream").as[FdrRow].collect().toSet
        === batchOver(rows.take(13)))
      input.addData(rows.slice(13, 14)) // single-row batch
      q.processAllAvailable()
      input.addData(rows.drop(14))
      q.processAllAvailable()
      val streamed = spark.table("fdr_stream").as[FdrRow].collect().toSet
      val batch = batchOver(rows)
      // arm sums are algebraic and the tail is the SAME code
      // (Analytics.fdrFromArms): bit-exact under any slicing
      assert(streamed === batch)
      // both test families present, ranks are a total order
      assert(streamed.map(_._1) === Set("welch_z", "chi2"))
      assert(streamed.map(_._7).toList.sorted ===
        (1L to streamed.size.toLong).toList)
    } finally q.stop()
  }

  test("streamed Mann–Whitney battery ≡ batch mwuExperiments bit-exact under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // repeated values inside and across arms so the tie-correction
    // path carries real weight through every cut
    val rows = (0 until 90).map { i =>
      (i.toLong, Seq("a", "b", "c")(i % 3),
        (i % 7).toDouble * 10.0 + 0.5, s"""{"k":"e${i % 2}"}""")
    }
    val input = MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.StreamingMetrics.startMwuExperiments(
      input.toDS().toDF("event_id", "event_type", "value", "props"),
      "mwu_stream")
    implicit val mwuEnc: org.apache.spark.sql.Encoder[(String, String,
      String, Double, Double, Long, Long, Double, Boolean)] =
      org.apache.spark.sql.Encoders.product
    type MwuRow = (String, String, String, Double, Double, Long, Long,
      Double, Boolean)
    def batchOver(rs: Seq[(Long, String, Double, String)]): Set[MwuRow] =
      graft.operators.Analytics.mwuExperiments(
        rs.toDF("event_id", "event_type", "value", "props"))
        .as[MwuRow].collect().toSet
    try {
      input.addData(rows.take(13))
      q.processAllAvailable()
      // after EVERY cut the published battery equals the batch face
      assert(spark.table("mwu_stream").as[MwuRow].collect().toSet
        === batchOver(rows.take(13)))
      input.addData(rows.slice(13, 14)) // single-row batch
      q.processAllAvailable()
      input.addData(rows.drop(14))
      q.processAllAvailable()
      val streamed = spark.table("mwu_stream").as[MwuRow].collect().toSet
      val batch = batchOver(rows)
      // the tie-group counts are algebraic and the tail is the SAME
      // code (Analytics.mwuFromGrain): bit-exact under any slicing
      assert(streamed === batch)
      assert(streamed.nonEmpty && streamed.forall(_._1 == "mwu_u"))
      assert(streamed.map(_._7).toList.sorted ===
        (1L to streamed.size.toLong).toList)
    } finally q.stop()
  }

  test("streamed Kruskal–Wallis ≡ batch kruskalExperiments bit-exact under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 3 arms × 2 experiments with heavy ties so the tie-corrected H′
    // and the WH tail carry real weight through every cut
    val rows = (0 until 90).map { i =>
      (i.toLong, Seq("a", "b", "c")(i % 3),
        (i % 7).toDouble * 10.0 + 0.5, s"""{"k":"e${i % 2}"}""")
    }
    val input = MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.StreamingMetrics.startKruskalExperiments(
      input.toDS().toDF("event_id", "event_type", "value", "props"),
      "kruskal_stream")
    implicit val kwEnc: org.apache.spark.sql.Encoder[(String, Long,
      Long, Double, Long, Double)] =
      org.apache.spark.sql.Encoders.product
    type KwRow = (String, Long, Long, Double, Long, Double)
    def batchOver(rs: Seq[(Long, String, Double, String)]): Set[KwRow] =
      graft.operators.Analytics.kruskalExperiments(
        rs.toDF("event_id", "event_type", "value", "props"))
        .as[KwRow].collect().toSet
    try {
      input.addData(rows.take(13))
      q.processAllAvailable()
      // after EVERY cut the published readout equals the batch face
      assert(spark.table("kruskal_stream").as[KwRow].collect().toSet
        === batchOver(rows.take(13)))
      input.addData(rows.slice(13, 14)) // single-row batch
      q.processAllAvailable()
      input.addData(rows.drop(14))
      q.processAllAvailable()
      val streamed =
        spark.table("kruskal_stream").as[KwRow].collect().toSet
      // the tie-group counts are algebraic and the tail is the SAME
      // code (Analytics.kruskalFromGrain): bit-exact under any slicing
      assert(streamed === batchOver(rows))
      assert(streamed.map(_._1) === Set("e0", "e1"))
      assert(streamed.forall(r => r._2 === 3L && r._5 === 2L))
    } finally q.stop()
  }

  test("streamed CUPED ≡ batch cupedLift bit-exact under uneven slicing at the same declared splits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 12 users × pre/post periods, per-user baseline confound in both
    // arms so θ and the adjusted means are non-trivial at every cut
    val rows = (0 until 96).map { i =>
      val u = i % 12
      val pre = i < 48
      val arm = if (pre || u % 2 == 0) "a" else "b"
      (i.toLong, u.toLong, arm,
        (u + 1).toDouble * 10.0 + (if (pre) 0.0 else 5.0 + (i % 3)),
        s"""{"k":"e${u % 2}"}""",
        i.toLong * 1000000L)
    }
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    def toDf(rs: Seq[(Long, Long, String, Double, String, Long)]) =
      withTs(rs.toDF("event_id", "user_id", "event_type", "value",
        "props", "us"))
    // the declared split: the batch face's own derived midpoints fed
    // back in, so batch cupedLift over ALL rows is the final oracle
    val splits = graft.operators.Analytics.cupedBase(toDf(rows))
      .groupBy(col("experiment_id"))
      .agg(expr("min(us) + (max(us) - min(us)) div 2").as("mid"))
    val input = MemoryStream[(Long, Long, String, Double, String, Long)]
    val q = graft.streaming.StreamingMetrics.startCupedLift(
      withTs(input.toDS().toDF(
        "event_id", "user_id", "event_type", "value", "props", "us")),
      "cuped_stream", splits)
    implicit val cuEnc: org.apache.spark.sql.Encoder[(String, String,
      Long, Double, Double, Double, Double)] =
      org.apache.spark.sql.Encoders.product
    type CuRow = (String, String, Long, Double, Double, Double, Double)
    // mid-cut oracle: the IDENTICAL batch tail over the partial rows
    // at the SAME declared splits
    def batchAt(rs: Seq[(Long, Long, String, Double, String, Long)])
        : Set[CuRow] =
      graft.operators.Analytics.cupedFromG1(
        graft.operators.Analytics.cupedBase(toDf(rs))
          .join(broadcast(splits), Seq("experiment_id"))
          .groupBy(col("experiment_id"), col("user_id"), col("variant"),
            (col("us") <= col("mid")).as("pre"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("s")))
        .as[CuRow].collect().toSet
    try {
      input.addData(rows.take(53))
      q.processAllAvailable()
      assert(spark.table("cuped_stream").as[CuRow].collect().toSet
        === batchAt(rows.take(53)))
      input.addData(rows.slice(53, 54)) // single-row batch
      q.processAllAvailable()
      input.addData(rows.drop(54))
      q.processAllAvailable()
      val streamed =
        spark.table("cuped_stream").as[CuRow].collect().toSet
      // at the final cut the declared splits coincide with the batch
      // face's derived midpoints: full batch cupedLift is the oracle
      assert(streamed === batchAt(rows))
      assert(streamed === graft.operators.Analytics.cupedLift(
        toDf(rows)).as[CuRow].collect().toSet)
      assert(streamed.map(r => (r._1, r._2)).size === streamed.size)
      assert(streamed.exists(_._7 > 0.0)) // real variance reduction
    } finally q.stop()
  }

  test("streamed winrate bootstrap CI ≡ batch winrateBootstrapCi bit-exact at BOTH kernels") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 8 judges × 3 items × 2 experiments; (i % 11) values make the
    // per-(judge, item) decimal sums differ across items (verified:
    // 6 pair rows, 4 comparisons each, winners varying 1–3 of 4) so
    // the point estimates, B_eff and the order-statistic picks all
    // carry weight; B = 48 keeps the resample fast while honoring
    // the >= 40 order-statistic floor
    val rows = (0 until 120).map { i =>
      (s"u${i % 8}", Seq("a", "b", "c")(i % 3),
        (i % 11).toDouble + 0.25, s"""{"k":"e${i % 2}"}""")
    }
    def toDf(rs: Seq[(String, String, Double, String)]) =
      rs.toDF("user_id", "event_type", "value", "props")
    // Row-seq compare (ci bounds are nullable doubles — a tuple
    // encoder would NPE on the NULL-CI surfacing path if it fired)
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    for (kernel <- Seq("md5", "xxhash64")) {
      val input = MemoryStream[(String, String, Double, String)]
      val q = graft.streaming.StreamingMetrics.startWinrateBootstrapCi(
        input.toDS().toDF("user_id", "event_type", "value", "props"),
        s"winrate_stream_$kernel", replicates = 48, kernel = kernel)
      def batchAt(rs: Seq[(String, String, Double, String)]) = rowSet(
        graft.operators.Preference.winrateBootstrapCi(
          toDf(rs), replicates = 48, kernel = kernel))
      try {
        input.addData(rows.take(17))
        q.processAllAvailable()
        // after EVERY cut the published readout equals the batch face:
        // the decimal judge grain is exact-associative and the tail is
        // the SAME code (Preference.winrateFromComps)
        assert(rowSet(spark.table(s"winrate_stream_$kernel"))
          === batchAt(rows.take(17)))
        input.addData(rows.slice(17, 18)) // single-row batch
        q.processAllAvailable()
        input.addData(rows.drop(18))
        q.processAllAvailable()
        val streamed = rowSet(spark.table(s"winrate_stream_$kernel"))
        assert(streamed === batchAt(rows))
        // 3 pairs × 2 experiments, CIs populated, win rates in [0,1]
        assert(streamed.size === 6)
        assert(streamed.forall(r => r(6) != null && r(7) != null))
      } finally q.stop()
    }
  }

  test("streamed best-of-n ≡ batch bestOfN bit-exact under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // values with deliberate ties (i % 5) so the event_id tie-break
    // and the margin-0 path both exercise; 3 groups of uneven size
    val rows = (0 until 45).map { i =>
      (i.toLong, (i % 3).toLong * 10, (i % 5).toDouble + 0.5)
    }
    val input = MemoryStream[(Long, Long, Double)]
    val q = graft.streaming.StreamingMetrics.startBestOfN(
      input.toDS().toDF("event_id", "user_id", "value"), "best_of_n_s")
    implicit val bonEnc: org.apache.spark.sql.Encoder[(Long, Long,
      Double, Long, Option[Double])] =
      org.apache.spark.sql.Encoders.product
    type BonRow = (Long, Long, Double, Long, Option[Double])
    try {
      input.addData(rows.take(7))
      q.processAllAvailable()
      input.addData(rows.slice(7, 8)) // single-row batch
      q.processAllAvailable()
      input.addData(rows.drop(8))
      q.processAllAvailable()
      // update-mode memory sink accumulates one row per touched key
      // per batch; n_candidates grows with every event, so the final
      // state per key is its max-n row
      val streamed = spark.table("best_of_n_s").as[BonRow].collect()
        .groupBy(_._1).map(_._2.maxBy(_._4)).toSet
      val batch = graft.operators.Preference.bestOfN(
        rows.toDF("event_id", "user_id", "value"))
        .as[BonRow].collect().toSet
      // top-2 maintenance is a semigroup fold: any slicing reproduces
      // the batch window's selection, count, and margin bit-exactly
      assert(streamed === batch)
      // the state operator holds exactly |groups| rows — O(1) per key
      val stateRows = q.lastProgress.stateOperators
        .filter(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).sum
      assert(stateRows === 3L, s"state rows $stateRows")
    } finally q.stop()
  }

  test("streamed pass@k ≡ batch passAtK bit-exact under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 5 tasks × 9 samples with varying pass rates (value > 100)
    val rows = (0 until 45).map { i =>
      (i.toLong, (i % 5).toLong, if (i % 7 < (i % 5)) 200.0 else 1.0)
    }
    val input = MemoryStream[(Long, Long, Double)]
    val q = graft.streaming.StreamingMetrics.startPassAtK(
      input.toDS().toDF("event_id", "user_id", "value"), "pass_at_k_s")
    try {
      input.addData(rows.take(13))
      q.processAllAvailable()
      input.addData(rows.slice(13, 14))
      q.processAllAvailable()
      input.addData(rows.drop(14))
      q.processAllAvailable()
      val streamed = spark.table("pass_at_k_s")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = graft.operators.Preference.passAtK(
        rows.toDF("event_id", "user_id", "value"))
        .as[(Long, Long, Long, Double)].collect().toSet
      // counts are algebraic and the estimator chain is the SAME code
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streamed SPRT verdict ≡ batch sprt_conversion final row under uneven slicing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = (0 until 90).map { i =>
      (i.toLong, f"2026-01-01 00:0${i / 60}:${i % 60}%02d",
        if (i % 4 == 0) 200.0 else 1.0)
    }
    def toEv(rs: Seq[(Long, String, Double)]) =
      rs.toDF("event_id", "s", "value")
        .selectExpr("event_id", "CAST(s AS TIMESTAMP) AS ts", "value")
    val input = MemoryStream[(Long, String, Double)]
    val q = graft.streaming.StreamingMetrics.startSprtConversion(
      input.toDS().toDF("event_id", "s", "value"), "sprt_s")
    try {
      input.addData(rows.take(17))
      q.processAllAvailable()
      input.addData(rows.drop(17))
      q.processAllAvailable()
      val st = spark.table("sprt_s")
        .as[(Long, Long, Double, String)].collect()
      assert(st.length === 1)
      val batchLast = graft.operators.Analytics.sprtConversion(toEv(rows))
        .orderBy(org.apache.spark.sql.functions.col("minute_key").desc)
        .limit(1)
        .selectExpr("n_cum", "conv_cum", "llr", "decision")
        .as[(Long, Long, Double, String)].collect()(0)
      // running counts are algebraic; llr/decision are the SAME chains
      assert(st(0) === batchLast)
    } finally q.stop()
  }

  test("keyed streaming SPRT: per-arm verdicts ≡ the batch chain; state = |arms|") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // arm (e1, a): 1/2 convert (drifts to h1); (e1, b): never converts
    // (h0 needs ~52 samples: 52·ln(0.85/0.9) < ln(0.05/0.95)); (e2, a):
    // ~1/8 conversion sits between p0 = 0.10 and p1 = 0.15, so its LLR
    // drifts near zero — 'continue'
    val rows = (0 until 240).map { i =>
      val (e, v) = if (i % 4 == 3) ("e2", "a")
        else ("e1", if (i % 2 == 0) "a" else "b")
      val value =
        if ((e == "e1" && v == "a" && i % 4 == 0) ||
          (e == "e2" && i % 32 == 3)) 200.0
        else 1.0
      (i.toLong, v, value, s"""{"k":"$e"}""")
    }
    val input = MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.StreamingMetrics.startKeyedSprt(
      input.toDS().toDF("event_id", "event_type", "value", "props"),
      "sprt_keyed")
    try {
      input.addData(rows.take(77))
      q.processAllAvailable()
      input.addData(rows.drop(77))
      q.processAllAvailable()
      implicit val kEnc: org.apache.spark.sql.Encoder[(String, String,
        Long, Long, Double, String)] =
        org.apache.spark.sql.Encoders.product
      type KRow = (String, String, Long, Long, Double, String)
      // last emission per arm = its max-n row
      val streamed = spark.table("sprt_keyed").as[KRow].collect()
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSet
      // batch comparator: per-arm counts through the SAME chains
      val batch = rows.toDF("event_id", "event_type", "value", "props")
        .selectExpr("get_json_object(props, '$.k') AS experiment_id",
          "event_type AS variant", "value")
        .groupBy("experiment_id", "variant")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_cum"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(
              org.apache.spark.sql.functions.col("value") > 100.0, 1L)
              .otherwise(0L)).as("conv_cum"))
        .selectExpr("experiment_id", "variant", "n_cum", "conv_cum",
          graft.operators.Analytics.sprtLlrExpr(0.10, 0.15) + " AS llr")
        .selectExpr("experiment_id", "variant", "n_cum", "conv_cum",
          "llr",
          graft.operators.Analytics.sprtDecisionExpr(0.05, 0.05)
            + " AS decision")
        .as[KRow].collect().toSet
      assert(streamed === batch)
      // per-arm independence: the three arms reach distinct verdicts
      val verdicts = streamed.map(r => (r._1, r._2) -> r._6).toMap
      assert(verdicts(("e1", "a")) === "accept_h1")
      assert(verdicts(("e1", "b")) === "accept_h0")
      val stateRows = q.lastProgress.stateOperators
        .filter(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).sum
      assert(stateRows === 3L, s"state rows $stateRows")
    } finally q.stop()
  }

  test("streaming corpus ingest replayed in order ≡ batch corpus_pipeline counts") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val expected = graft.operators.Corpus.corpusPipeline(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(expected.nonEmpty)

    val rows = docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    val input = MemoryStream[(Long, String, String)]
    val store = new MetricsStore
    val q = StreamingMetrics.startCorpusIngest(
      input.toDS().toDF("doc_id", "text", "lang"), store, "corpus_ingest_t")
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val got = store.counters.toMap
        .collect { case (k, v) if k.startsWith("corpus_docs:") =>
          val Array(_, split, lang) = k.split(":"); (split, lang) -> v }
        .toMap
      assert(got === expected)
    } finally q.stop()

    // a re-played duplicate batch adds nothing (fp state + ledger)
    val input2 = MemoryStream[(Long, String, String)]
    val store2 = new MetricsStore
    val q2 = StreamingMetrics.startCorpusIngest(
      input2.toDS().toDF("doc_id", "text", "lang"), store2, "corpus_ingest_t2")
    try {
      input2.addData(chunks.head: _*); q2.processAllAvailable()
      val snap = store2.counters.toMap
      input2.addData(chunks.head: _*); q2.processAllAvailable()
      assert(store2.counters.toMap === snap, "duplicate replay must be a no-op")
    } finally q2.stop()
  }

  test("streamed pinned-weights scores ≡ batch quality_score_pinned") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val batch = graft.operators.Classifier.qualityScorePinned(docs)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    assert(batch.nonEmpty)
    val rows = docs.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Classifier.qualityScorePinnedStream(
        input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("pinned_score_t").start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("pinned_score_t")
        .as[(Long, Long, Long, Double, Long, Long)].collect().sortBy(_._1)
      // every score byte-identical to the oracled batch face, over any
      // micro-batch slicing
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("corpus ingest with the model gate admits exactly the batch " +
    "predicted=1 set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.Registry.ensure(spark)
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    // batch twin of the gated ingest: heuristic rules, then the pinned
    // scoring's predicted=1, then keep-min-doc_id per fingerprint
    val heur = docs
      .select(col("doc_id"), col("lang"), col("text"),
        split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 32)
      .select(col("doc_id"), col("lang"), col("text"),
        expr("ngram_stats(toks, 3)").as("st"))
      .where(lit(1.0) - col("st.n_distinct_ngrams").cast("double") /
        col("st.n_ngrams").cast("double") <= 0.2)
      .select(col("doc_id"), col("lang"), col("text"))
    val gated = graft.operators.Classifier.withPinnedScore(heur)
      .where(col("predicted") === 1L)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
    val expected = gated
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("rep"))
      .select(col("rep.doc_id"), col("rep.lang"))
      .withColumn("split",
        when(graft.operators.Corpus.hashBucket(col("doc_id")) < 10,
          lit("val")).otherwise(lit("train")))
      .groupBy("split", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(expected.nonEmpty)
    // the model gate must actually gate: fewer docs than heuristics-only
    val heurOnly = heur.count()
    assert(expected.values.sum < heurOnly,
      "pinned gate rejected nothing — test fixture too easy")
    val rows = docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val input = MemoryStream[(Long, String, String)]
    val store = new MetricsStore
    val q = StreamingMetrics.startCorpusIngest(
      input.toDS().toDF("doc_id", "text", "lang"), store,
      "corpus_ingest_gated_t", modelGate = true)
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val got = store.counters.toMap
        .collect { case (k, v) if k.startsWith("corpus_docs:") =>
          val Array(_, split, lang) = k.split(":"); (split, lang) -> v }
        .toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("soak: O(100) micro-batches through the checkpointed 5-branch fan-out " +
    "with an abrupt mid-run kill/restart — store ≡ batch twin") {
    import spark.implicits._
    // file source, not MemoryStream: the fan-out is FIVE independently
    // checkpointed queries over one source, and MemoryStream keeps a
    // single global commit pointer (restarting queries at diverged
    // offsets trips its out-of-order commit check) — a real source
    // (files, Kafka, Pub/Sub) has per-consumer progress, which is
    // exactly what each branch's checkpoint records
    val srcDir = java.nio.file.Files.createTempDirectory("graft_soak_src")
    val root = java.nio.file.Files.createTempDirectory("graft_soak_ck").toString
    val store = new MetricsStore
    def wire(i: Int): String = {
      val uid = s"u${i % 37}"; val exp = s"e${i % 5}"; val v = s"${i % 3}"
      val iso = f"2026-08-12T10:${15 + i / 20}%02d:${i % 60}%02dZ"
      s"""{"uid":"$uid","experiment_id":"$exp","variant":"$v","timestamp":"$iso"}"""
    }
    def writeSlice(b: Int): Unit = {
      val tmp = java.nio.file.Files.createTempFile("graft_soak_stage", ".json")
      java.nio.file.Files.write(tmp,
        (0 until 5).map(i => wire(b * 5 + i)).mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, srcDir.resolve(f"slice$b%03d.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def fileEvents = {
      // maxFilesPerTrigger=1 pins one file per micro-batch, so 50
      // slices drive ~50 batches PER branch (~250 across the fan-out)
      val raw = spark.readStream.option("maxFilesPerTrigger", 1)
        .text(srcDir.toString)
      graft.sources.Tables.parseJsonEvents(raw)
        .withColumnRenamed(LogEvent.ExperimentId, "experimentId")
        .as[LogEvent]
    }
    def start() = StreamingMetrics.startPipeline(fileEvents, store,
      checkpointRoot = Some(root))
    val nSlices = 50
    var queries = start()
    // measured bounded-state evidence (SCALE.md §9): snapshot every
    // stateful operator's store size at fixed points in the run —
    // the only in-memory-store stateful branch is the update-mode HLL
    // aggregate, whose state rows must track the MINUTE-KEY DOMAIN,
    // never the number of events or micro-batches
    val stateSnaps =
      scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    def snapState(slice: Int): Unit = queries.foreach { q =>
      Option(q.lastProgress).foreach(_.stateOperators.foreach { so =>
        stateSnaps += ((slice, q.name, so.numRowsTotal, so.memoryUsedBytes))
      })
    }
    try {
      (0 until 20).foreach { b =>
        writeSlice(b); queries.foreach(_.processAllAvailable())
        if (b == 9 || b == 19) snapState(b + 1)
      }
      // abrupt kill: slices 20-24 land but are NOT drained before
      // stop — whatever batch was in flight is redelivered on restart,
      // and the ledger (INCRBY) / idempotence (SADD, upsert) must
      // absorb it without double-counting
      (20 until 25).foreach(writeSlice)
      queries.foreach(_.stop())
      queries = start()
      (25 until nSlices).foreach { b =>
        writeSlice(b); queries.foreach(_.processAllAvailable())
        if (b == 34 || b == nSlices - 1) snapState(b + 1)
      }
      queries.foreach(_.processAllAvailable())
    } finally queries.foreach(q => if (q.isActive) q.stop())
    // batch twin over the same 250 events
    case class E(uid: String, exp: String, variant: String, minute: String)
    val all = (0 until nSlices * 5).map(i =>
      E(s"u${i % 37}", s"e${i % 5}", s"${i % 3}",
        f"2026_08_12T10_${15 + i / 20}%02d"))
    all.groupBy(_.minute).foreach { case (mk, evs) =>
      assert(store.counter(s"visitCounter_$mk") === evs.size.toLong,
        s"visits at $mk")
      assert(store.scard(s"set_dthr_$mk") ===
        evs.map(_.uid).distinct.size.toLong, s"unique users at $mk")
      assert(store.scard(s"set_experiments_$mk") ===
        evs.map(_.exp).distinct.size.toLong, s"experiments at $mk")
      // the update-mode approx branch recovered its HLL state across
      // the kill: estimate within the sketch's error of the exact count
      val exact = evs.map(_.uid).distinct.size.toDouble
      val est = store.counter(s"hll_dthr_$mk").toDouble
      assert(est > exact * 0.8 && est < exact * 1.2,
        s"HLL estimate $est vs exact $exact at $mk")
    }
    all.groupBy(_.variant).foreach { case (v, evs) =>
      assert(store.scard(s"set_var_$v") ===
        evs.map(_.uid).distinct.size.toLong, s"variant $v uniques")
    }
    // bounded state, measured: print the snapshots for the record
    // (SCALE.md §9 quotes a run) and pin the claim — final state rows
    // equal the minute-key domain, so 5x more batches of the same
    // minutes would add ZERO state rows
    stateSnaps.foreach { case (s, qn, rows, bytes) =>
      info(f"SOAK-STATE slice=$s%2d query=$qn rows=$rows bytes=$bytes")
    }
    val hll = stateSnaps.filter(_._2 == "hll_users_minute")
    assert(hll.nonEmpty, "no state snapshots captured for the HLL branch")
    val minutesSeen = all.map(_.minute).distinct.size.toLong
    assert(hll.last._3 === minutesSeen,
      s"HLL state rows ${hll.last._3} != minute domain $minutesSeen — " +
        "state grew with the stream, not the key domain")
    // and the in-flight store footprint stays tiny in absolute terms
    assert(hll.map(_._4).max < (1L << 20),
      s"HLL state ${hll.map(_._4).max} bytes — over 1 MiB for 13 minutes")
  }
}
