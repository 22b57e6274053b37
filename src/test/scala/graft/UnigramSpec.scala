package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unigram
import graft.sources.Tables

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("viterbi segment: reconstructs the word, prefers likely pieces, always total") {
    val lp = Map("ab" -> -1.0, "a" -> -3.0, "b" -> -3.0, "c" -> -3.0,
      "abc" -> -5.0)
    // 'ab'+'c' (-4) beats 'abc' (-5) and 'a'+'b'+'c' (-9)
    assert(Unigram.segment("abc", lp, floorLp = -20.0) === List("ab", "c"))
    // unseen characters fall back to the floor, never fail
    assert(Unigram.segment("axb", lp, floorLp = -20.0) === List("a", "x", "b"))
    assert(Unigram.segment("zzz", lp, floorLp = -20.0) === List("z", "z", "z"))
    // segmentation is a partition of the word
    val seg = Unigram.segment("ababab", lp, floorLp = -20.0)
    assert(seg.mkString === "ababab")
    assert(seg === List("ab", "ab", "ab"))
  }

  test("training shrinks to target, keeps char coverage, favors frequent substrings") {
    val docs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(6)(if (i % 2 == 0) "sharing" else "shared")
        .mkString(" "))).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, targetVocab = 12, rounds = 3)
    val pieces = vocab.map(_._1)
    assert(vocab.size <= 12)
    // all single chars of the corpus survive pruning
    val charsNeeded = "sharingshared".toSet.map((c: Char) => c.toString)
    assert(charsNeeded.subsetOf(pieces.toSet))
    // the shared stem earns a multi-char piece
    assert(pieces.exists(p => p.length > 1 && "sharing".contains(p)),
      pieces.mkString(","))
    // deterministic under partitioning
    val again = Unigram.train(docs.repartition(7), targetVocab = 12, rounds = 3)
    assert(vocab === again)
  }

  test("corpus faces: vocab table is ranked; encode covers every word") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val vocab = graft.operators.Unigram.unigramVocab(docs, targetVocab = 64)
      .as[(Long, String, Long, Double)].collect()
    assert(vocab.length <= 64 && vocab.nonEmpty)
    assert(vocab.map(_._1).toSeq === (1L to vocab.length))
    val lps = vocab.map(_._4)
    assert(lps.zip(lps.tail).forall { case (a, b) => a >= b }, "ranked by logp")

    val enc = Unigram.unigramEncode(docs, targetVocab = 64)
      .as[(Long, Long, Long)].collect()
    val words = docs.select(
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " "))).count()
    assert(enc.map(_._2).sum === words, "every corpus word encoded")
    // pieces >= words (a piece never spans words), and no degenerate
    // char-explosion (vocab carries useful multi-char pieces)
    assert(enc.forall(r => r._3 >= r._2))
    val ratio = enc.map(_._3).sum.toDouble / words
    assert(ratio < 4.0, s"pieces/word ratio $ratio suspiciously high")
  }

  test("pinned segmentation: reconstructs the word, cost is optimal vs brute force") {
    import graft.operators.Unigram
    // adversarial words beyond the corpus vocabulary, incl. repeats
    // and lengths that stress every DP window slot
    val words = Seq("mississippi", "tablescan", "xyzzyq", "a", "ab",
      "zzzzzzzzzzzz", "interchangeably")
    def brute(w: String, maxLen: Int): Long = {
      // exhaustive min-cost segmentation (exponential — test-only)
      val memo = scala.collection.mutable.Map.empty[Int, Option[Long]]
      def go(i: Int): Option[Long] =
        if (i == w.length) Some(0L)
        else memo.getOrElseUpdate(i, {
          val opts = for {
            l <- 1 to math.min(maxLen, w.length - i)
            c <- Unigram.pinnedPieceCost(w.substring(i, i + l))
            rest <- go(i + l)
          } yield c + rest
          if (opts.isEmpty) None else Some(opts.min)
        })
      go(0).get
    }
    words.foreach { w =>
      val pieces = Unigram.segmentWith(w,
        p => Unigram.pinnedPieceCost(p)
          .fold(Double.NegativeInfinity)(c => -c.toDouble), 4)
      assert(pieces.mkString("") === w, s"$w reconstruction")
      val cost = pieces.map(p => Unigram.pinnedPieceCost(p).get).sum
      assert(cost === brute(w, 4), s"$w: DP cost $cost not optimal")
    }
    // the refactor guard: segment() still equals segmentWith under a
    // map-backed scorer
    val lp = Map("he" -> -1.0, "llo" -> -1.5, "hello" -> -9.0)
    assert(Unigram.segment("hello", lp, floorLp = -20.0) ===
      Unigram.segmentWith("hello",
        p => if (lp.contains(p)) lp(p)
             else if (p.length == 1) -20.0 else Double.NegativeInfinity))
  }
}
