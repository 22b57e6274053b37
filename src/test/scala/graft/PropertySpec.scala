package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Metrics

/** Property tests (SURVEY.md §5.3) over generated event sets:
  * (a) overlap is on unordered pairs without self-pairs and bounded by
  *     min set size;
  * (b) per-minute counts partition the total;
  * (c) HLL estimate within 5·rsd of exact;
  * (d) results are invariant under input permutation (the reference's
  *     key-addressed merges are order-insensitive).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Draw `n` samples from a ScalaCheck generator with fixed seeds —
    * deterministic property checking without the scalatest bridge. */
  private def forAllSamples[T](gen: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      val sample = gen.apply(Gen.Parameters.default.withSize(60), Seed(i.toLong))
        .getOrElse(fail(s"generator exhausted at seed $i"))
      body(sample)
    }

  private val eventGen = for {
    uid <- Gen.chooseNum(1, 25)
    exp <- Gen.chooseNum(1, 5)
    variant <- Gen.oneOf("default", "1", "2", "3")
    minute <- Gen.chooseNum(0, 6)
    second <- Gen.chooseNum(0, 59)
  } yield (uid.toString, exp.toString, variant,
    f"2026-08-12 10:$minute%02d:$second%02d")

  private val eventsGen = Gen.nonEmptyListOf(eventGen)

  private def toDf(rows: List[(String, String, String, String)]): DataFrame =
    rows.toDF("uid", "experiment_id", "variant", "ts_str")
      .selectExpr("uid", "experiment_id", "variant",
        "CAST(ts_str AS TIMESTAMP) AS timestamp")

  test("overlap: unordered, no self-pairs, bounded by smaller side") {
    forAllSamples(eventsGen) { rows =>
      val df = toDf(rows)
      val overlap = Metrics.variantOverlap(df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val sets = rows.groupBy(_._3).map { case (v, rs) => v -> rs.map(_._1).toSet }
      overlap.foreach { case (a, b, n) =>
        assert(a < b)
        assert(n === (sets(a) & sets(b)).size.toLong)
        assert(n <= math.min(sets(a).size, sets(b).size))
      }
      // completeness: every intersecting pair appears
      val expectedPairs = for {
        a <- sets.keys; b <- sets.keys
        if a < b && (sets(a) & sets(b)).nonEmpty
      } yield (a, b)
      assert(overlap.map(t => (t._1, t._2)).toSet === expectedPairs.toSet)
    }
  }

  test("per-minute visit counts partition the total event count") {
    forAllSamples(eventsGen) { rows =>
      val df = toDf(rows)
      val total = Metrics.visitsPerMinute(df)
        .agg(sum("visits")).head().getLong(0)
      assert(total === rows.length.toLong)
    }
  }

  test("HLL estimate within 5*rsd of exact on generated uid multisets") {
    forAllSamples(eventsGen) { rows =>
      val df = toDf(rows)
      val exact = Metrics.uniqueUsersPerVariant(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val approx = Metrics.uniqueUsersPerVariantApprox(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (v, e) =>
        assert(math.abs(approx(v) - e).toDouble / e <= 0.25)
      }
    }
  }

  test("approx percentiles track exact percentiles on the events table") {
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf0001)
    val approx = graft.operators.Relational.valuePercentilesApprox(ev).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // rank-based bound: approx_percentile returns an actual sample whose
    // RANK is within n/accuracy of the target — value distance is
    // unbounded on heavy tails, so assert the rank window instead
    val values = ev.select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    values.foreach { case (et, sorted) =>
      val n = sorted.length
      Seq(0.5, 0.9, 0.99).zip(approx(et)).foreach { case (q, a) =>
        val lo = math.floor((q - 0.01) * (n - 1)).toInt.max(0)
        val hi = math.ceil((q + 0.01) * (n - 1)).toInt.min(n - 1)
        assert(a >= sorted(lo) && a <= sorted(hi),
          s"$et q=$q: approx $a outside rank window [${sorted(lo)}, ${sorted(hi)}] (n=$n)")
      }
    }
  }

  test("saltedJoin ≡ plain join on generated fact/dim sets for any salt count") {
    val factGen = Gen.nonEmptyListOf(for {
      eid <- Gen.chooseNum(1L, 500L)
      key <- Gen.chooseNum(1L, 8L) // few keys → heavy per-key fan-out
    } yield (eid, key))
    forAllSamples(Gen.zip(factGen, Gen.oneOf(1, 3, 16))) { case (rows, salts) =>
      val fact = rows.distinct.toDF("event_id", "user_id")
      val dim = (1L to 6L).map(k => (k, s"tag$k")).toDF("user_id", "tag")
      val salted = graft.operators.Skew
        .saltedJoin(fact, dim, "user_id", col("event_id"), salts)
        .select("event_id", "user_id", "tag")
        .as[(Long, Long, String)].collect().sorted.toList
      val plain = fact.join(dim, Seq("user_id"))
        .select("event_id", "user_id", "tag")
        .as[(Long, Long, String)].collect().sorted.toList
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("funnel set-ops partition the click universe: both + click_only = distinct clickers") {
    forAllSamples(eventsGen) { rows =>
      val ev = rows.toDF("uid", "experiment_id", "variant", "ts_str")
        .selectExpr("CAST(uid AS BIGINT) AS user_id",
          "CASE WHEN variant = 'default' THEN 'click' " +
            "WHEN variant = '1' THEN 'purchase' ELSE 'view' END AS event_type")
      val seg = graft.operators.Analytics.funnelSetOps(ev)
        .as[(String, Long)].collect().toMap
      val clickers = ev.where(col("event_type") === "click")
        .select("user_id").distinct().count()
      val purchasers = ev.where(col("event_type") === "purchase")
        .select("user_id").distinct().count()
      assert(seg("click_and_purchase") + seg("click_only") === clickers)
      assert(seg("click_and_purchase") + seg("purchase_only") === purchasers)
    }
  }

  test("ntileByRange ≡ ntile().over on random data for random k") {
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)),
      Gen.chooseNum(1, 12))
    forAllSamples(gen) { case (vs, k) =>
      // unique sort keys (ntile over a non-total order is tie-arbitrary)
      val rows = vs.distinct.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("id", "v")
      val expect = df.withColumn("bucket",
          ntile(k).over(Window.orderBy("v", "id")).cast("long"))
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      val got = graft.operators.Analytics
        .ntileByRange(df, Seq("v", "id"), k, partitions = 5)
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      assert(got === expect, s"k=$k n=${rows.size}")
    }
  }

  test("permutation invariance: shuffled input yields identical metrics") {
    forAllSamples(Gen.zip(eventsGen, Gen.chooseNum(1L, 999L))) { case (rows, seed) =>
      val df = toDf(rows)
      val shuffled = toDf(new scala.util.Random(seed).shuffle(rows))
        .repartition(3)
      assert(Metrics.visitsPerMinute(df).collect().toSeq ===
        Metrics.visitsPerMinute(shuffled).collect().toSeq)
      assert(Metrics.usersPerExperimentVariantMinute(df).collect().toSeq ===
        Metrics.usersPerExperimentVariantMinute(shuffled).collect().toSeq)
    }
  }

  test("snapshotDiff laws on random keyed tables: self-diff empty, apply(diff) rebuilds new") {
    val tableGen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1L, 20L)
      v <- Gen.option(Gen.oneOf("x", "y", "z"))
    } yield (k, v)).map(_.distinctBy(_._1)) // keyed: one row per key
    forAllSamples(Gen.zip(tableGen, tableGen), n = 4) { case (oldT, newT) =>
      val old = oldT.toDF("k", "v")
      val neu = newT.toDF("k", "v")
      // self-diff is empty (null-safe compare: None == None)
      assert(graft.operators.Maintenance
        .snapshotDiff(old, old, Seq("k"), Seq("v")).isEmpty)
      // apply(diff, old) == new, for arbitrary old/new
      val diff = graft.operators.Maintenance
        .snapshotDiff(old, neu, Seq("k"), Seq("v"))
      val rebuilt = old.join(diff.select("k"), Seq("k"), "left_anti")
        .unionByName(diff.where(col("op") =!= "D")
          .select(col("k"), col("new_v").as("v")))
        .as[(Long, Option[String])].collect().toSet
      assert(rebuilt === newT.toSet)
    }
  }

  test("mergeCounts fold is batch-split invariant (the algebraic merge law)") {
    forAllSamples(Gen.zip(eventsGen, Gen.chooseNum(1, 5)), n = 4) {
      case (events, nBatches) =>
        val df = events.toDF("uid", "exp", "variant", "ts")
          .select(col("uid"), to_timestamp(col("ts")).as("m"))
          .select(col("uid"), date_trunc("minute", col("m")).as("m"))
        def agg(b: DataFrame) = b.groupBy("m").agg(count(lit(1)).as("visits"))
        val oneShot = agg(df).as[(java.sql.Timestamp, Long)].collect().toMap
        val folded = (0 until nBatches)
          .map(i => agg(df.where(pmod(xxhash64(col("uid")), lit(nBatches)) === i)))
          .reduce((s, d) => graft.operators.Maintenance
            .mergeCounts(s, d, Seq("m"), "visits"))
          .as[(java.sql.Timestamp, Long)].collect().toMap
        assert(folded === oneShot)
    }
  }

  test("connected components match an independent union-find on random graphs (both paths)") {
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(1L, 30L)
      bRaw <- Gen.chooseNum(1L, 29L) // shift past a: total, never a self-loop
    } yield (a, if (bRaw >= a) bRaw + 1 else bRaw))
    forAllSamples(edgesGen, n = 4) { edges =>
      // reference: textbook union-find, written independently of the
      // operator's internals
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        parent.getOrElseUpdate(x, x)
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (edges.flatMap(e => Seq(e._1, e._2))).distinct
        .map(v => v -> find(v)).toMap
      val df = edges.toDF("a", "b")
      val local = graft.operators.Dedup.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val dist = graft.operators.Dedup.connectedComponents(df, "a", "b",
        localEdgeThreshold = 0L).as[(Long, Long)].collect().toMap
      val star = graft.operators.Dedup.connectedComponentsStar(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(local === want)
      assert(dist === want)
      assert(star === want)
    }
  }

  test("media codecs: encode/parse round-trips for any dims/rates") {
    import graft.operators.MediaCodecs
    val bmpGen = Gen.zip(Gen.chooseNum(1, 300), Gen.chooseNum(1, 200),
      Gen.long)
    forAllSamples(bmpGen, n = 8) { case (w, h, seed) =>
      val m = MediaCodecs.parse(0L, MediaCodecs.encodeBmp(w, h, seed))
      assert(m.format === "bmp" && m.width === Some(w) && m.height === Some(h))
      val p = MediaCodecs.parse(0L, MediaCodecs.encodePng(w, h, seed))
      assert(p.format === "png" && p.width === Some(w) && p.height === Some(h))
    }
    val wavGen = Gen.zip(Gen.chooseNum(1, 192000), Gen.chooseNum(1, 8),
      Gen.chooseNum(0, 10000))
    forAllSamples(wavGen, n = 8) { case (rate, ch, nSamples) =>
      val m = MediaCodecs.parse(0L, MediaCodecs.encodeWav(rate, ch, nSamples, 1L))
      assert(m.format === "wav" && m.sample_rate === Some(rate) &&
        m.channels === Some(ch))
      // the parser's integer duration math, restated
      assert(m.duration_ms ===
        Some(nSamples.toLong * ch * 2 * 1000 / (rate.toLong * ch * 2)))
    }
    // arbitrary junk never throws and never misidentifies as a known
    // format unless it genuinely carries that magic
    forAllSamples(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)), n = 10) {
      bytes =>
        val m = MediaCodecs.parse(0L, bytes.toArray)
        assert(m.media_id === 0L) // total function: always returns
    }
  }

  test("int8 quantization: scales cancel — integer cosine tracks float cosine") {
    import graft.operators.Similarity
    val vecGen = Gen.zip(
      Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)),
      Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)))
      .suchThat { case (a, b) =>
        a.exists(_ != 0f) && b.exists(_ != 0f) }
    forAllSamples(vecGen, n = 8) { case (a, b) =>
      val df = Seq((1L, a.toArray), (2L, b.toArray)).toDF("vec_id", "embedding")
      val q = Similarity.quantizeEmbeddings(df)
        .select("vec_id", "q").as[(Long, Seq[Byte])].collect().toMap
      def dotI(x: Seq[Byte], y: Seq[Byte]): Double =
        x.zip(y).map { case (p, r) => p.toDouble * r }.sum
      val cosQ = dotI(q(1L), q(2L)) /
        (math.sqrt(dotI(q(1L), q(1L))) * math.sqrt(dotI(q(2L), q(2L))))
      def dotF(x: Seq[Float], y: Seq[Float]): Double =
        x.zip(y).map { case (p, r) => p.toDouble * r }.sum
      val cosF = dotF(a, b) /
        (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b)))
      // 16-dim int8: quantization shifts cosine by well under 0.05
      assert(math.abs(cosQ - cosF) < 0.05,
        s"int8 cosine $cosQ drifted from float $cosF")
    }
  }

  test("passAtK laws on generated (n, c): bounded in [0,1], monotone in c, exact at the edges") {
    val caseGen = for {
      n <- Gen.chooseNum(4, 40)
      c <- Gen.chooseNum(0, n)
    } yield (n, c)
    forAllSamples(Gen.nonEmptyListOf(caseGen), n = 3) { cases =>
      // one synthetic task per (n, c): c values above the threshold
      val rows = cases.zipWithIndex.flatMap { case ((n, c), t) =>
        (0 until n).map(i =>
          ((t.toLong * 1000) + i, t.toLong,
            if (i < c) 200.0 else 1.0))
      }
      val got = graft.operators.Preference
        .passAtK(rows.toDF("event_id", "user_id", "value"))
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      cases.zipWithIndex.foreach { case ((n, c), t) =>
        val (gn, gc, p) = got(t.toLong)
        assert(gn === n.toLong && gc === c.toLong)
        assert(p >= 0.0 && p <= 1.0, s"pass@4 out of bounds: $p")
        if (c == 0) assert(p === 0.0, s"c=0 must give 0, got $p")
        if (n - c < 4) assert(p === 1.0, s"<k failures must give 1, got $p")
      }
      // monotone in c at fixed n: group generated cases by n
      cases.zipWithIndex.groupBy(_._1._1).values.foreach { grp =>
        grp.sortBy(_._1._2).map { case ((_, _), t) => got(t.toLong)._3 }
          .sliding(2).foreach {
            case Seq(a, b) => assert(a <= b + 1e-12,
              s"pass@k not monotone in c: $a > $b")
            case _ =>
          }
      }
    }
  }

  test("groupAdvantages laws: advantages sum to ~0 and have unit sample variance per group") {
    val gen = Gen.nonEmptyListOf(for {
      g <- Gen.chooseNum(1, 6)
      v <- Gen.chooseNum(1, 9999)
    } yield (g.toLong, v / 100.0))
    forAllSamples(gen, n = 3) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("event_id", "user_id", "value")
      val adv = graft.operators.Preference.groupAdvantages(df)
        .where(col("advantage").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("advantage")).as("s"),
          sum(col("advantage") * col("advantage")).as("s2"))
        .collect()
      adv.foreach { r =>
        val n = r.getAs[Long]("n")
        // quantization leaves the sum within n·1e-9 of zero
        assert(math.abs(r.getAs[Double]("s")) < n * 1e-6)
        // sample variance of z-scores is 1 by construction
        assert(math.abs(r.getAs[Double]("s2") / (n - 1).max(1) - 1.0)
          < 1e-3 || n == 1)
      }
    }
  }
}
