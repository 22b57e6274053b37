package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata — the schema a
  * multimodal training pipeline carries image/audio/video in. */
case class MediaItem(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    width: Int,
    height: Int,
    duration_ms: Long)

/** Decoded per-item features (the output of the "model/decoder" step). */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float])

/** A sampled frame from a video payload. */
case class MediaFrame(
    media_id: Long,
    frame_idx: Int,
    frame_bytes: Array[Byte])

/** Multimodal-column plumbing: binary payloads with typed metadata,
  * batched decode / feature extraction / frame sampling as
  * `mapPartitions` over typed Datasets.
  *
  * The CONTAINER-HEADER decode (dimensions, sample rates, durations —
  * the corpus-wide validate/probe pass) is real: see [[MediaCodecs]],
  * which parses actual BMP/WAV/PNG/GIF/JPEG byte layouts and is
  * oracle-checked as `media_metadata`. Only the deep pixel/sample →
  * tensor decode (JPEG entropy decoding, H.264) is STUBBED — the
  * container has no media libraries — with a deterministic fake
  * ([[decodeStub]]), clearly marked. Everything around it (binary
  * schema, encoders, partition-level batching, explode of sampled
  * frames, downstream aggregation) is the real Spark plumbing a
  * production pipeline would use: per-partition batch iteration mimics
  * vectorized decoder batches (decode libraries amortize setup per
  * batch, so the iterator is chunked, not row-at-a-time), and nothing
  * ever collects to the driver.
  */
object Multimodal {

  /** STUB decoder — deterministic fake standing in for a real image/
    * audio decode. Folds payload bytes into `dim` accumulators and
    * normalizes; output depends only on the bytes, so tests and
    * repeated runs agree. The normalization divides in DOUBLE and only
    * then rounds to float32 — both steps are IEEE-exact and thus
    * reproducible by the DuckDB oracle (`CAST(sum AS DOUBLE) / n` then
    * `AS REAL`). Replace with a real decoder (e.g. JNI/FFI to
    * libjpeg/ffmpeg) without touching any Spark plumbing. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff)
      i += 1
    }
    val n = math.max(payload.length, 1)
    acc.map(v => (v.toDouble / n).toFloat)
  }

  /** 60-bit content checksum: the first 15 hex chars of the payload's
    * MD5, as a (positive) long. MD5 rather than a rolling polynomial so
    * the oracle can reproduce it (`('0x' || substr(md5(text), 1, 15))
    * ::BIGINT`); 15 chars keeps it inside the signed-64 range. */
  private def checksum60(payload: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    // first 7.5 bytes = 15 hex chars = 60 bits
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Fabricate a deterministic media table from `documents` (the
    * container ships no real media): payload = UTF-8 bytes of the text,
    * kind/width/height/duration derived from doc_id. Stands in for
    * `spark.read.format("binaryFile")` or a parquet table with a binary
    * column — schema and downstream plumbing are identical. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
      (pmod(col("doc_id"), lit(300)) * 1000).as("duration_ms"))
      .as[MediaItem]
  }

  /** Batched decode/feature-extract: `mapPartitions` with chunked
    * iteration (`grouped(batchSize)`) — the Scala equivalent of a
    * pandas-batch UDF: the (stubbed) decoder is invoked per batch,
    * amortizing per-batch setup, and the iterator never materializes a
    * partition in memory. */
  def extractFeatures(items: Dataset[MediaItem], batchSize: Int = 64,
      dim: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here (model load, codec init)
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            checksum60(m.payload), decodeStub(m.payload, dim))
        }
      }
    }
  }

  /** Frame sampling for video payloads: slice the payload into
    * fixed-size pseudo-frames and keep every `everyN`-th — the flatMap
    * shape of real frame extraction (1 row in, 0..n rows out), with the
    * frame decode stubbed as a byte slice. */
  def sampleFrames(items: Dataset[MediaItem], frameBytes: Int = 64,
      everyN: Int = 4): Dataset[MediaFrame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      val nFrames = m.payload.length / frameBytes
      (0 until nFrames).by(everyN).map { f =>
        MediaFrame(m.media_id, f,
          m.payload.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** End-to-end multimodal query: fabricate media, batch-extract
    * features, aggregate per kind. All aggregated values are integral
    * (counts, byte totals, first feature bucket) so the result is
    * deterministic under any partitioning. */
  def featureSummary(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(spark, documents))
    feats.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        // xor-fold, not sum: checksums span the full 64-bit range and a
        // sum overflows under ANSI; xor is order-insensitive and closed
        expr("bit_xor(checksum)").as("checksum_xor"),
        sum(element_at(col("features"), 1).cast("long")).as("f0_sum"))
      .orderBy("kind")
  }

  /** Oracle-checked face of [[sampleFrames]]: per video item, how many
    * frames the every-4th sampler keeps and the sum of kept frame
    * indices — both pure functions of payload length, so the oracle
    * replays them arithmetically. The flatMap's 1-row-in/0..n-out
    * shape (and its empty-output edge for sub-frame payloads) is what
    * this locks in. */
  def frameSampleStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaFromDocuments(spark, documents))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_idx").cast("long")).as("idx_sum"))
      .orderBy("media_id")
  }

  /** DuckDB oracle for [[frameSampleStats]]: video = doc_id ≡ 2 (mod
    * 3); nf = len/64 whole frames; sampler keeps ceil(nf/4) indices
    * 0,4,… whose sum is 2k(k−1) for k kept. Zero-frame payloads emit
    * no row (flatMap semantics). */
  val frameSampleStatsSql: String =
    """WITH v AS (
      |  SELECT doc_id AS media_id, strlen(text) // 64 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |k AS (SELECT media_id, (nf + 3) // 4 AS kept FROM v WHERE nf > 0)
      |SELECT media_id, kept AS n_frames,
      |  (2 * kept * (kept - 1))::BIGINT AS idx_sum
      |FROM k ORDER BY media_id""".stripMargin

  /** DuckDB oracle for [[featureSummary]]. Replays the deterministic
    * stub end-to-end in SQL: the payload is the UTF-8 text (ASCII
    * corpus, so `ord` per char == byte), feature 0 folds bytes at
    * positions ≡ 0 (mod 8), the checksum is the 60-bit MD5 prefix, and
    * every float step (DOUBLE divide → REAL round → floor) is
    * IEEE-exact in both engines. */
  val featureSummarySql: String =
    """WITH item AS (
      |  SELECT
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS kind,
      |    strlen(text) AS n_bytes,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS checksum,
      |    floor(CAST(CAST(
      |        list_sum([ord(text[i]) for i in range(1, strlen(text) + 1, 8)])
      |      AS DOUBLE) / strlen(text) AS REAL))::BIGINT AS f0
      |  FROM documents)
      |SELECT kind, count(*) AS n_items, sum(n_bytes)::BIGINT AS total_bytes,
      |  bit_xor(checksum) AS checksum_xor, sum(f0)::BIGINT AS f0_sum
      |FROM item GROUP BY 1 ORDER BY kind""".stripMargin
}
