package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo, arXiv 1804.10959 — the
  * SentencePiece algorithm family), in its deterministic hard-EM form:
  * seed a large candidate piece inventory from frequent substrings,
  * then alternate Viterbi segmentation of the WORD TABLE under current
  * piece log-probs (E) with count re-estimation and bottom-fraction
  * pruning (M) until the vocabulary reaches its target size. The
  * second tokenizer trainer beside [[TextAnalysis.bpeTrain]] — BPE
  * grows a vocab bottom-up by merges, unigram-LM shrinks one top-down
  * by likelihood.
  *
  * Scale design (the [[TextAnalysis.bpeTrain]] discipline): the corpus
  * is touched ONCE to build the word-frequency table; every EM round
  * runs over that bounded table with the model BROADCAST to it —
  * per-round driver state is the vocabulary itself (model-sized, like
  * k-means centroids or the classifier's weights), and the only
  * per-round shuffle is the piece-count aggregate (vocab-sized).
  * Encoding a corpus is one equi-join of its words against the final
  * word→pieces map — the same read-time shape as [[TextAnalysis.bpeEncode]].
  *
  * Determinism: Viterbi ties break toward the LONGER first piece, count
  * ties in pruning break lexicographically, and log-probs are quantized
  * to 1e-9 — identical vocab on any partitioning or rerun.
  */
object Unigram {

  /** Viterbi segmentation of `word` under `lp` (piece → log-prob).
    * Single characters absent from the vocab get `floorLp` so every
    * word is always segmentable. Ties prefer the longer last piece
    * (deterministic; matches the greedy intuition). */
  def segment(word: String, lp: collection.Map[String, Double],
      floorLp: Double, maxPieceLen: Int = 8): List[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0d
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val plp =
          if (lp.contains(piece)) lp(piece)
          else if (i - j == 1) floorLp
          else Double.NegativeInfinity
        val cand = best(j) + plp
        // strict >: j ascends, so ties keep the smallest j already
        // found — the longest last piece. Deterministic.
        if (cand > best(i)) { best(i) = cand; back(i) = j }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var pos = n
    while (pos > 0) { out = word.substring(back(pos), pos) :: out; pos = back(pos) }
    out
  }

  /** The corpus's word-frequency table — the ONE corpus-sized pass. */
  def wordTable(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))

  /** Train a `targetVocab`-piece unigram LM. Returns the driver-side
    * vocabulary (model-sized by construction) as (piece, logp) with
    * logp quantized to 1e-9. */
  def train(documents: DataFrame, targetVocab: Int = 256,
      rounds: Int = 4, maxPieceLen: Int = 8,
      seedFactor: Int = 4): Seq[(String, Double)] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val words = wordTable(documents)
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seed inventory: the seedFactor*target most frequent substrings
      // (weighted by word count) + every single character (coverage).
      // The top-k runs DISTRIBUTED (orderBy+limit = per-partition
      // heaps), so the driver only ever holds the bounded seed set.
      val subCounts = words.flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxPieceLen, w.length - i)
        } yield (w.substring(i, i + l), c)
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }
        .toDF("piece", "c")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val chars = subCounts.where(length(col("piece")) === 1)
        .as[(String, Long)].collect()
      val multi = subCounts.where(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece"))
        .limit(seedFactor * targetVocab)
        .as[(String, Long)].collect()
      subCounts.unpersist()
      var vocab: Map[String, Long] = (chars ++ multi).toMap
      val shrinkPerRound =
        math.max(1, (vocab.size - targetVocab) / math.max(1, rounds - 1))

      for (r <- 0 until rounds) {
        val total = vocab.values.sum.toDouble
        val lp = vocab.map { case (p, c) =>
          p -> quantize(math.log((c + 1).toDouble / (total + vocab.size)))
        }
        val floorLp = quantize(math.log(1.0 / (total + vocab.size))) - 10.0
        val bc = spark.sparkContext.broadcast(lp)
        // E: Viterbi counts over the word table (piece-keyed aggregate,
        // vocab-sized output)
        val counts = words.flatMap { case (w, c) =>
          segment(w, bc.value, floorLp, maxPieceLen).map(_ -> c)
        }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case (p, c) => (p, c) }
          .collect().toMap
        bc.destroy()
        // M: re-estimate, keep all chars (coverage) + the best pieces
        val (charsNow, multiNow) = vocab.keys.toSeq
          .map(p => p -> counts.getOrElse(p, 0L))
          .partition(_._1.length == 1)
        val keep =
          if (r == rounds - 1 || vocab.size <= targetVocab) multiNow
          else multiNow.sortBy { case (p, c) => (-c, p) }
            .take(math.max(targetVocab - charsNow.size,
              multiNow.size - shrinkPerRound))
        vocab = (charsNow ++ keep).toMap
      }
      // final size clamp + deterministic order
      val total = vocab.values.sum.toDouble
      val (chars2, multi2) = vocab.toSeq.partition(_._1.length == 1)
      val kept = chars2 ++ multi2.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, targetVocab - chars2.size))
      kept.map { case (p, c) =>
        p -> quantize(math.log((c + 1).toDouble / (total + vocab.size)))
      }.sortBy { case (p, lpv) => (-lpv, p) }
    } finally words.unpersist()
  }

  private def quantize(d: Double): Double =
    BigDecimal(d).setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** ONE training per (corpus, targetVocab) per session: the vocab and
    * encode faces both need the trained model, and retraining inside
    * each query doubled the pair's cost for identical results
    * (training is deterministic). Keyed by the ANALYZED plan's
    * semantic hash — same source ⇒ same key within a session; the
    * cached value is the model (≤ targetVocab pairs), not data. At
    * scale the same sharing is a materialized vocab table the encode
    * join reads (the `writeBm25Index`/`bm25SearchIndexed` pattern) —
    * this memo is the single-session equivalent. */
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Seq[(String, Double)]]()
  private def trainCached(documents: DataFrame,
      targetVocab: Int): Seq[(String, Double)] =
    trained.computeIfAbsent(
      (documents.queryExecution.analyzed.semanticHash(), targetVocab),
      _ => train(documents, targetVocab))

  /** Catalog face: the trained vocabulary as a table
    * `(vocab_rank, piece, piece_len, logp)`. Rows-only by the twin
    * convention (iterative EM training is not SQL-expressible);
    * coverage/consistency floors live in `UnigramSpec`. */
  def unigramVocab(documents: DataFrame, targetVocab: Int = 256): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    trainCached(documents, targetVocab).zipWithIndex
      .map { case ((p, lpv), i) => (i + 1L, p, p.length.toLong, lpv) }
      .toDF("vocab_rank", "piece", "piece_len", "logp")
  }

  /** Catalog face: encode the corpus under the trained model — the
    * word table is segmented ONCE (bounded work, model broadcast) and
    * the corpus's words join that map at read time, exactly
    * [[TextAnalysis.bpeEncode]]'s shape. Output per doc:
    * `(doc_id, n_words, n_pieces)`. */
  def unigramEncode(documents: DataFrame, targetVocab: Int = 256): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val lp = trainCached(documents, targetVocab).toMap
    val floorLp = lp.values.min - 10.0
    val bc = spark.sparkContext.broadcast(lp)
    val segLen = wordTable(documents).as[(String, Long)]
      .map { case (w, _) =>
        (w, segment(w, bc.value, floorLp).length.toLong)
      }.toDF("word", "n_pieces_word")
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .join(segLen, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces_word")).as("n_pieces"))
      .orderBy("doc_id")
  }
}
