package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.sources.Tables

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def syntheticDocs = {
    // linearly separable: class 1 draws from vocab g0..g9, class 0
    // from b0..b9 (deterministic round-robin "sampling")
    val rows = (0 until 200).map { i =>
      val vocab = if (i % 2 == 0) (0 until 10).map(j => s"g$j")
                  else (0 until 10).map(j => s"b$j")
      val toks = (0 until 12).map(t => vocab((i * 7 + t * 3) % 10))
      (i.toLong, toks.mkString(" "), if (i % 2 == 0) 1d else 0d)
    }
    rows.toDF("doc_id", "text", "y")
  }

  test("one GD step matches the analytic logistic gradient exactly") {
    val d = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val dim = 8
    val feats = Classifier.hashedFeatures(d, dim, lit(1d))
    val (w, _) = Classifier.trainLogReg(feats, dim, iters = 1, lr = 1.0)
    // p0 = sigmoid(0) = 0.5, err = -0.5; both tokens hash to one index
    // j with g = 2 * (err / 2) = -0.5; bias gradient likewise. First
    // Adagrad step: w += lr * g / sqrt(g^2 + eps)
    val g = -0.5
    val expected = -1.0 * g / math.sqrt(g * g + 1e-10)
    assert(math.abs(w(dim) - expected) < 1e-12)
    val nonzero = w.dropRight(1).zipWithIndex.filter(_._1 != 0d)
    assert(nonzero.length === 1)
    assert(math.abs(nonzero.head._1 - expected) < 1e-12)
  }

  test("training separates a separable corpus; loss decreases") {
    val dim = 256
    val feats = Classifier.hashedFeatures(syntheticDocs, dim, col("y"))
      .persist()
    try {
      val (w, losses) = Classifier.trainLogReg(feats, dim, iters = 10,
        lr = 4.0, trackLoss = true)
      assert(losses.head > losses.last,
        s"loss should fall: ${losses.head} -> ${losses.last}")
      assert(losses.last < 0.3, s"final loss too high: ${losses.last}")
      val scored = Classifier.score(syntheticDocs, w, dim, col("y"))
        .select(avg((col("predicted") === col("label")).cast("double")))
        .head.getDouble(0)
      assert(scored >= 0.99, s"train accuracy $scored on separable data")
    } finally feats.unpersist()
  }

  test("convergence early-exit: tol stops the loop on a small improvement, never a worsening") {
    val dim = 256
    val feats = Classifier.hashedFeatures(syntheticDocs, dim, col("y"))
      .persist()
    try {
      val (wTol, lossesTol) = Classifier.trainLogReg(feats, dim,
        iters = 40, lr = 4.0, tol = 0.01)
      assert(lossesTol.length < 40,
        s"tol should exit early, ran ${lossesTol.length} rounds")
      // the exit fired on a small IMPROVEMENT (0 <= d < tol) — a
      // worsened loss (oscillation) must never trigger it
      val d = lossesTol(lossesTol.length - 2) - lossesTol.last
      assert(d >= 0 && d < 0.01, s"exit delta $d out of [0, tol)")
      // quality at the early-exited weights still separates
      val acc = Classifier.score(syntheticDocs, wTol, dim, col("y"))
        .select(avg((col("predicted") === col("label")).cast("double")))
        .head.getDouble(0)
      assert(acc >= 0.99, s"early-exit accuracy $acc")
    } finally feats.unpersist()
  }

  test("quality_classifier distills the teacher rule above the majority baseline") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val got = Classifier.qualityClassifier(docs)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("train", "val"))
    val (_, nVal, nPosVal, _, accVal) = got("val")
    val majority = math.max(nPosVal.toDouble, (nVal - nPosVal).toDouble) / nVal
    assert(accVal > majority,
      s"val accuracy $accVal must beat majority baseline $majority")
    assert(got("train")._5 >= 0.85,
      s"train accuracy ${got("train")._5} should be high on a text-derived rule")
  }

  test("pinned scoring face: integer margin arithmetic matches a driver recompute") {
    val dim = 64
    val docs = Seq((1L, "alpha beta beta"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = Classifier.qualityScorePinned(docs, dim)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the empty doc is dropped; the others score
    assert(got.keySet === Set(1L, 3L))
    val w = Classifier.pinnedWeights(dim)
    assert(w.forall(v => v >= -1000 && v <= 1000))
    assert(w.distinct.length > dim / 2, "pinned weights should be spread out")
    def md5l(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def wsum(toks: Seq[String]): Long =
      toks.map(t => w((md5l(t) % dim).toInt)).sum
    val (_, n1, ws1, m1, p1, _) = got(1L)
    assert(n1 === 3L && ws1 === wsum(Seq("alpha", "beta", "beta")))
    assert(m1 === ws1.toDouble / 10000.0 / 3.0)
    assert(p1 === (if (m1 >= 0) 1L else 0L))
    val (_, n3, ws3, _, _, _) = got(3L)
    assert(n3 === 1L && ws3 === wsum(Seq("x")))
  }

  test("temperatureFit: full grid, unique argmin, NLL at T* never above T=1") {
    val docs = syntheticDocs.select(col("doc_id"), col("text"))
    val got = Classifier.temperatureFit(docs).collect()
    assert(got.length === 8)
    assert(got.map(_.getAs[Double]("t_scale")).toList ===
      List(0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 4.0))
    val best = got.filter(_.getAs[Boolean]("is_best"))
    assert(best.length === 1, "argmin flag must be unique")
    val nllBest = best.head.getAs[Double]("nll")
    val nllT1 = got.find(_.getAs[Double]("t_scale") == 1.0).get
      .getAs[Double]("nll")
    assert(nllBest <= nllT1,
      s"grid argmin ($nllBest) must not exceed the T=1 NLL ($nllT1)")
    // every row is a real readout: finite NLL, ECE in [0,1], same count
    got.foreach { r =>
      assert(!r.getAs[Double]("nll").isNaN && r.getAs[Double]("nll") >= 0)
      val e = r.getAs[Double]("ece")
      assert(e >= 0.0 && e <= 1.0)
      assert(r.getAs[Long]("n_docs") === got.head.getAs[Long]("n_docs"))
    }
  }

  test("temperatureFit: NLL is exactly the mean quantized bernoulli NLL at each T (driver recompute at T=2)") {
    val docs = syntheticDocs.select(col("doc_id"), col("text")).limit(50)
    val scored = Classifier.withPinnedScore(docs)
      .select("margin", "label").collect()
    def q9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = scored.map { r =>
      val m = r.getAs[Double]("margin"); val y = r.getAs[Long]("label")
      val p0 = q9(1.0 / (1.0 + math.exp(-20.0 * m / 2.0)))
      val p = math.min(math.max(p0, 1e-9), 0.999999999)
      q9(if (y == 1L) -math.log(p) else -math.log(1.0 - p))
    }
    val expected = q9(terms.map(BigDecimal(_)).sum.toDouble / terms.length)
    val got = Classifier.temperatureFit(docs).collect()
      .find(_.getAs[Double]("t_scale") == 2.0).get.getAs[Double]("nll")
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
  }

  test("calibrationBins: bins partition confidence, means stay in-bin, ECE is the weighted gap") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val rows = Classifier.calibrationBins(docs).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getAs[Long]("n")).sum
    // every scored doc lands in exactly one bin
    val scored = Classifier.withPinnedScore(
      docs.select(col("doc_id"), col("text"))).count()
    assert(nTotal === scored)
    val eces = rows.map(_.getAs[Double]("ece")).distinct
    assert(eces.length === 1, s"ece must be one scalar, got $eces")
    var weighted = 0.0
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val conf = r.getAs[Double]("conf_mean")
      // quantization can nudge a mean at most 1e-9 past the bin edge
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin conf $conf out of range")
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(acc - conf))
        < 1e-9)
      weighted += r.getAs[Long]("n").toDouble * r.getAs[Double]("gap")
    }
    assert(math.abs(eces.head - weighted / nTotal) < 1e-8,
      s"ece ${eces.head} vs recomputed ${weighted / nTotal}")
  }
}
