package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parsed container metadata for an opaque media payload. Image-only
  * fields (width/height) are None for audio and vice versa. */
case class MediaMeta(
    media_id: Long,
    format: String, // "bmp" | "wav" | "png" | "gif" | "jpeg" | "unknown"
    width: Option[Int],
    height: Option[Int],
    bit_depth: Option[Int],
    channels: Option[Int],
    sample_rate: Option[Int],
    duration_ms: Option[Long])

/** REAL media container decoding — the round-6 gap closed: where
  * [[Multimodal.decodeStub]] stands in for the deep pixel/sample →
  * tensor decode (which needs codec libraries this container doesn't
  * ship), the HEADER layer of the common containers is fully public
  * byte layout (PNG: W3C/RFC 2083; BMP: BITMAPINFOHEADER; WAV: RIFF;
  * GIF: GIF89a spec; JPEG: ISO/IEC 10918 marker segments) and is
  * parsed here for real — no stub, no fake. This is the step a
  * training pipeline runs corpus-wide (validate + extract dimensions,
  * sample rates, durations BEFORE spending GPU decode on the payload),
  * so it earns a first-class oracle-checked operator.
  *
  * Scale shape: [[parse]] is a pure per-row byte walk over the header
  * prefix (no allocation beyond the result), run inside
  * `mapPartitions` on the scan side — zero shuffle, parallel by
  * construction, and indifferent to payload size because only the
  * first KB is touched. The writers ([[encodeBmp]]/[[encodeWav]]/
  * [[encodePng]]) produce real, viewer-openable files and exist so a
  * query can fabricate deterministic payloads from the test corpus;
  * the spec proves [[parse]] against the INDEPENDENT JDK encoders
  * (ImageIO, AudioSystem) so a symmetric encode/parse bug cannot
  * hide. */
object MediaCodecs {

  // ---------------------------------------------------------------- parse

  /** Sniff + parse a payload's container header. Unknown or truncated
    * payloads yield format="unknown" with all fields None — corrupt
    * inputs are DATA at 100 TB, never exceptions. */
  def parse(mediaId: Long, payload: Array[Byte]): MediaMeta = {
    def none = MediaMeta(mediaId, "unknown", None, None, None, None, None, None)
    if (payload == null || payload.length < 12) none
    else try {
      if (payload(0) == 'B' && payload(1) == 'M') parseBmp(mediaId, payload)
      else if (startsWith(payload, "RIFF", 0) && startsWith(payload, "WAVE", 8))
        parseWav(mediaId, payload)
      else if ((payload(0) & 0xff) == 0x89 && startsWith(payload, "PNG", 1))
        parsePng(mediaId, payload)
      else if (startsWith(payload, "GIF8", 0)) parseGif(mediaId, payload)
      else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
        parseJpeg(mediaId, payload)
      else none
    } catch { case _: IndexOutOfBoundsException | _: BufferUnderflow => none }
  }

  private class BufferUnderflow extends RuntimeException
  private def startsWith(b: Array[Byte], s: String, off: Int): Boolean =
    b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i))

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** BITMAPINFOHEADER layout: 'BM', u32 file size, u32 reserved,
    * u32 pixel offset, u32 header size, i32 width, i32 height (may be
    * negative = top-down), u16 planes, u16 bpp — all little-endian. */
  private def parseBmp(id: Long, b: Array[Byte]): MediaMeta = {
    if (b.length < 30) throw new BufferUnderflow
    val bpp = u16le(b, 28)
    MediaMeta(id, "bmp", Some(i32le(b, 18)), Some(math.abs(i32le(b, 22))),
      Some(bpp), Some(if (bpp >= 24) 3 else 1), None, None)
  }

  /** RIFF chunk walk: 'RIFF' size 'WAVE', then chunks `id size body`
    * (word-aligned). 'fmt ' carries format/channels/rate/bits; 'data'
    * carries the sample byte count → duration = bytes·1000/byteRate. */
  private def parseWav(id: Long, b: Array[Byte]): MediaMeta = {
    var pos = 12
    var channels, rate, bits, byteRate = 0
    var dataBytes = -1L
    while (pos + 8 <= b.length && (channels == 0 || dataBytes < 0)) {
      val size = i32le(b, pos + 4)
      if (startsWith(b, "fmt ", pos)) {
        channels = u16le(b, pos + 10)
        rate = i32le(b, pos + 12)
        byteRate = i32le(b, pos + 16)
        bits = u16le(b, pos + 22)
      } else if (startsWith(b, "data", pos)) dataBytes = size.toLong
      // a corrupt size of -8/-9 would make the advance a no-op and hang
      // the task forever — reject non-positive progress as malformed
      if (size < 0) throw new BufferUnderflow
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels == 0) throw new BufferUnderflow
    val dur = if (dataBytes >= 0 && byteRate > 0)
      Some(dataBytes * 1000L / byteRate) else None
    MediaMeta(id, "wav", None, None, Some(bits), Some(channels), Some(rate), dur)
  }

  /** PNG signature + IHDR (always the first chunk): u32be width, u32be
    * height, u8 bit depth, u8 color type (0 grey, 2 truecolor, 3
    * palette, 4 grey+alpha, 6 truecolor+alpha). */
  private def parsePng(id: Long, b: Array[Byte]): MediaMeta = {
    if (b.length < 26 || !startsWith(b, "IHDR", 12)) throw new BufferUnderflow
    val channels = (b(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => throw new BufferUnderflow
    }
    MediaMeta(id, "png", Some(i32be(b, 16)), Some(i32be(b, 20)),
      Some(b(24) & 0xff), Some(channels), None, None)
  }

  /** GIF87a/89a logical screen descriptor: u16le width, u16le height
    * at offset 6; color resolution bits in the packed byte. */
  private def parseGif(id: Long, b: Array[Byte]): MediaMeta = {
    if (b.length < 11) throw new BufferUnderflow
    val packed = b(10) & 0xff
    MediaMeta(id, "gif", Some(u16le(b, 6)), Some(u16le(b, 8)),
      Some(((packed >> 4) & 0x7) + 1), Some(1), None, None)
  }

  /** JPEG marker walk to the first SOFn (0xC0–0xCF except DHT/JPG/DAC):
    * segment = 0xFF marker u16be length payload; SOF payload = u8
    * precision, u16be height, u16be width, u8 components. */
  private def parseJpeg(id: Long, b: Array[Byte]): MediaMeta = {
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) throw new BufferUnderflow
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
      else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (pos + 9 >= b.length) throw new BufferUnderflow
          val height = ((b(pos + 5) & 0xff) << 8) | (b(pos + 6) & 0xff)
          val width = ((b(pos + 7) & 0xff) << 8) | (b(pos + 8) & 0xff)
          return MediaMeta(id, "jpeg", Some(width), Some(height),
            Some(b(pos + 4) & 0xff), Some(b(pos + 9) & 0xff), None, None)
        }
        if (marker == 0xda) throw new BufferUnderflow // SOS before any SOF
        pos += 2 + len
      }
    }
    throw new BufferUnderflow
  }

  // --------------------------------------------------------------- encode

  /** A real 24bpp BMP (BITMAPINFOHEADER, bottom-up, 4-byte-padded
    * rows). Pixel (x,y) channels derive from `seed` so payloads are
    * content-addressed and deterministic. */
  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowSize = (width * 3 + 3) & ~3
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed + y.toLong * width + x
        buf.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y += 1
    }
    buf.array()
  }

  /** A real PCM WAV: RIFF/fmt/data with 16-bit samples derived from
    * `seed` (a simple deterministic ramp — real files, real duration
    * math, content-addressed bytes). */
  def encodeWav(sampleRate: Int, channels: Int, nSamplesPerChannel: Int,
      seed: Long): Array[Byte] = {
    val dataSize = nSamplesPerChannel * channels * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < nSamplesPerChannel * channels) {
      buf.putShort(((seed + i * 257) & 0xffff).toShort)
      i += 1
    }
    buf.array()
  }

  /** A real PNG: signature, IHDR (8-bit truecolor), one zlib-deflated
    * IDAT of filter-0 scanlines, IEND — each chunk CRC32-correct, so
    * any PNG reader opens it. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      val row = y * (1 + width * 3)
      raw(row) = 0 // filter type: None
      var x = 0
      while (x < width) {
        val v = seed + y.toLong * width + x
        raw(row + 1 + x * 3) = (v & 0xff).toByte
        raw(row + 2 + x * 3) = ((v >> 8) & 0xff).toByte
        raw(row + 3 + x * 3) = ((v >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(12 + body.length)
      out.putInt(body.length).put(tag.getBytes).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(out.array(), 4, 4 + body.length)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height).put(8.toByte).put(2.toByte) // truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array(137.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      13.toByte, 10.toByte, 26.toByte, 10.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  // --------------------------------------------------------------- query

  /** Fabricate a deterministic media-binary table from `documents`:
    * doc_id ≡ 0 (mod 3) → BMP, ≡ 1 → WAV, ≡ 2 → PNG, with dimensions /
    * rates / sample counts that are pure functions of doc_id — so a
    * SQL oracle can state the expected metadata without parsing a
    * byte. Payloads are REAL files (any image/audio tool opens them);
    * construction runs in `mapPartitions` on the scan side. */
  def mediaBinaries(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val payload = (id % 3) match {
          case 0 => encodeBmp(bmpW(id), bmpH(id), id)
          case 1 => encodeWav(wavRate(id), wavChannels(id), wavSamples(id), id)
          case _ => encodePng(pngW(id), pngH(id), id)
        }
        (id, payload)
      }
    }.toDF("media_id", "payload")
  }

  // dimension formulas shared by the builder and the SQL oracle
  private def bmpW(id: Long): Int = (id % 31).toInt + 1
  private def bmpH(id: Long): Int = (id % 17).toInt + 1
  private def wavRate(id: Long): Int = 8000 + (id % 8).toInt * 1000
  private def wavChannels(id: Long): Int = (id % 2).toInt + 1
  private def wavSamples(id: Long): Int = (id % 100).toInt + 1
  private def pngW(id: Long): Int = (id % 23).toInt + 1
  private def pngH(id: Long): Int = (id % 13).toInt + 1

  /** The oracle-checked metadata-extraction query: build real files,
    * parse their real headers back, one row per item. A mismatch
    * anywhere in the byte layout — ours or the oracle formulas' —
    * breaks the hash compare. */
  def mediaMetadata(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    mediaBinaries(spark, documents)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => parse(id, payload) })
      .toDF()
      .orderBy("media_id")
  }

  /** DuckDB replay of [[mediaMetadata]]: the metadata formulas stated
    * directly. duration_ms replays the parser's integer math
    * bytes·1000 / byteRate = samples·1000 / rate exactly (both
    * integer-divide). */
  val mediaMetadataSql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'png' END
      |    AS format,
      |  CASE doc_id % 3 WHEN 0 THEN (doc_id % 31 + 1)::INT
      |       WHEN 2 THEN (doc_id % 23 + 1)::INT END AS width,
      |  CASE doc_id % 3 WHEN 0 THEN (doc_id % 17 + 1)::INT
      |       WHEN 2 THEN (doc_id % 13 + 1)::INT END AS height,
      |  CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 16 ELSE 8 END::INT
      |    AS bit_depth,
      |  CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN (doc_id % 2 + 1)::INT
      |       ELSE 3 END AS channels,
      |  CASE doc_id % 3 WHEN 1 THEN (8000 + (doc_id % 8) * 1000)::INT END
      |    AS sample_rate,
      |  CASE doc_id % 3 WHEN 1 THEN
      |    ((doc_id % 100 + 1) * (doc_id % 2 + 1) * 2 * 1000)
      |      // ((8000 + (doc_id % 8) * 1000) * (doc_id % 2 + 1) * 2)
      |  END AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------- sample decode

  /** REAL PCM sample decode of a 16-bit WAV: the RIFF chunk walk of
    * [[parseWav]] continued into the `data` chunk, little-endian
    * signed samples (channel-interleaved, as stored). None unless it's
    * a plain 16-bit PCM WAV with a complete data chunk. */
  def decodeWavSamples(b: Array[Byte]): Option[Array[Short]] = {
    if (b == null || b.length < 44 || !startsWith(b, "RIFF", 0) ||
      !startsWith(b, "WAVE", 8)) return None
    var pos = 12
    var bits = 0
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (bits == 0 || dataOff < 0)) {
      val size = i32le(b, pos + 4)
      if (size < 0) return None
      if (startsWith(b, "fmt ", pos)) bits = u16le(b, pos + 22)
      else if (startsWith(b, "data", pos)) { dataOff = pos + 8; dataLen = size }
      pos += 8 + size + (size & 1)
      if (pos < 0) return None // chunk-size overflow on a corrupt header
    }
    // long arithmetic: dataOff + dataLen near 2^31 must not wrap positive
    if (bits != 16 || dataOff < 0 ||
      b.length.toLong < dataOff.toLong + dataLen.toLong) return None
    val out = new Array[Short](dataLen / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((b(dataOff + i * 2) & 0xff) |
        (b(dataOff + i * 2 + 1) << 8)).toShort
      i += 1
    }
    Some(out)
  }

  /** REAL pixel decode of an 8-bit truecolor PNG (color type 2, or 6
    * with alpha): walk the chunk stream, inflate the concatenated IDAT
    * payload, reverse the per-row filters (None/Sub/Up/Average/Paeth —
    * the full RFC 2083 §6 set), and fold to row-major integer luma
    * (r+g+b). None for palette/grey/16-bit/interlaced images or any
    * corrupt stream — data, never exceptions. */
  def decodePngGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 8 || (b(0) & 0xff) != 0x89 ||
      !startsWith(b, "PNG", 1)) return None
    try {
      var pos = 8
      var w, h, bitDepth = 0
      var colorType, interlace = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && pos + 12 <= b.length) {
        val len = i32be(b, pos)
        if (len < 0 || pos + 12 + len > b.length) return None
        val typ = new String(b, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        typ match {
          case "IHDR" =>
            if (len < 13) return None
            w = i32be(b, pos + 8); h = i32be(b, pos + 12)
            bitDepth = b(pos + 16) & 0xff; colorType = b(pos + 17) & 0xff
            interlace = b(pos + 20) & 0xff
          case "IDAT" => idat.write(b, pos + 8, len)
          case "IEND" => done = true
          case _ => // ancillary chunks skipped
        }
        pos += 12 + len
      }
      if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
      val bpp = colorType match { case 2 => 3; case 6 => 4; case _ => return None }
      if (w.toLong * h * bpp > Int.MaxValue / 2) return None
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val stride = 1 + w * bpp
      val raw = new Array[Byte](stride * h)
      var off = 0
      try {
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && inf.needsInput()) return None // truncated stream
          off += n
        }
      } finally inf.end() // free native memory on every exit path
      if (off < raw.length) return None
      val px = new Array[Byte](w * bpp * h)
      var y = 0
      while (y < h) {
        val f = raw(y * stride) & 0xff
        val rs = y * stride + 1
        val os = y * w * bpp
        var x = 0
        while (x < w * bpp) {
          val rv = raw(rs + x) & 0xff
          val a = if (x >= bpp) px(os + x - bpp) & 0xff else 0
          val up = if (y > 0) px(os - w * bpp + x) & 0xff else 0
          val c = if (y > 0 && x >= bpp) px(os - w * bpp + x - bpp) & 0xff else 0
          val recon = f match {
            case 0 => rv
            case 1 => rv + a
            case 2 => rv + up
            case 3 => rv + ((a + up) / 2)
            case 4 =>
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up)
              val pc = math.abs(p - c)
              rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
            case _ => return None
          }
          px(os + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val gray = new Array[Int](w * h)
      var i = 0
      while (i < gray.length) {
        val o = i * bpp
        gray(i) = (px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)
        i += 1
      }
      Some((w, h, gray))
    } catch {
      case _: IndexOutOfBoundsException |
           _: java.util.zip.DataFormatException => None
    }
  }

  /** A real GIF89a with a 256-entry grayscale palette (r=g=b=i, so
    * luma = 3·index) and pixel index `(seed + y·w + x) mod 256`. The
    * LZW stream is the spec's "uncompressed" form: root codes only,
    * with a CLEAR every 254 symbols so the decoder's dictionary never
    * forces a width change past 9 bits — larger than compressed
    * output but byte-valid for ANY decoder (ImageIO reads these files
    * back in `MediaCodecsSpec`). */
  def encodeGif(width: Int, height: Int, seed: Long): Array[Byte] = {
    val n = width * height
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nb = 0
    def code9(c: Int): Unit = {
      acc |= c << nb
      nb += 9
      while (nb >= 8) { bits.write(acc & 0xff); acc >>= 8; nb -= 8 }
    }
    code9(256) // CLEAR
    var i = 0
    var run = 0
    while (i < n) {
      if (run == 254) { code9(256); run = 0 }
      code9(((seed + i) % 256).toInt)
      run += 1
      i += 1
    }
    code9(257) // EOI
    if (nb > 0) bits.write(acc & 0xff)
    val data = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes)
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xf7) // GCT present, 8-bit color res, 256 entries
    out.write(0); out.write(0)
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0) // no LCT, not interlaced
    out.write(8) // LZW min code size
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.write(0)
    out.write(0x3b)
    out.toByteArray
  }

  /** A real ANIMATED GIF89a: the [[encodeGif]] container with one
    * Graphic Control Extension + full-frame image descriptor + LZW
    * stream per frame (same grayscale GCT, luma = 3·index; same
    * root-codes-only LZW with a CLEAR every 254 symbols). `frames`
    * are palette-index arrays (0..255), all `width`×`height`.
    * ImageIO reads every frame back (`MediaCodecsSpec`). */
  def encodeGifAnimated(width: Int, height: Int,
      frames: Array[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes)
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xf7) // GCT present, 8-bit color res, 256 entries
    out.write(0); out.write(0)
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    frames.foreach { px =>
      // Graphic Control Extension: no disposal tricks, 4/100 s delay
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(4); out.write(0); out.write(0); out.write(0)
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(width & 0xff); out.write((width >> 8) & 0xff)
      out.write(height & 0xff); out.write((height >> 8) & 0xff)
      out.write(0) // no LCT, not interlaced
      out.write(8) // LZW min code size
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0
      var nb = 0
      def code9(cd: Int): Unit = {
        acc |= cd << nb
        nb += 9
        while (nb >= 8) { bits.write(acc & 0xff); acc >>= 8; nb -= 8 }
      }
      code9(256) // CLEAR
      var i = 0
      var run = 0
      while (i < px.length) {
        if (run == 254) { code9(256); run = 0 }
        code9(px(i) & 0xff)
        run += 1
        i += 1
      }
      code9(257) // EOI
      if (nb > 0) bits.write(acc & 0xff)
      val data = bits.toByteArray
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        out.write(len)
        out.write(data, off, len)
        off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF LZW decompressor (the GIF89a flavor: variable-width codes
    * starting at `minCodeSize+1`, clear/EOI codes, 4096-entry
    * dictionary, KwKwK case). Returns exactly `nPixels` color indices,
    * or null for any malformed stream. */
  private def lzwDecode(d: Array[Byte], minCodeSize: Int,
      nPixels: Int): Array[Int] = {
    if (minCodeSize < 1 || minCodeSize > 8) return null
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val firstCh = new Array[Int](4096)
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var bitPos = 0
    val totalBits = d.length * 8
    val out = new Array[Int](nPixels)
    var op = 0
    var prev = -1
    def firstOf(c: Int): Int = if (c < clear) c else firstCh(c)
    def readCode(): Int =
      if (bitPos + codeSize > totalBits) -1
      else {
        var v = 0
        var i = 0
        while (i < codeSize) {
          if (((d((bitPos + i) >> 3) >> ((bitPos + i) & 7)) & 1) != 0)
            v |= 1 << i
          i += 1
        }
        bitPos += codeSize
        v
      }
    def emit(code: Int): Boolean = {
      var len = 1
      var c = code
      while (c >= clear) { len += 1; c = prefix(c) }
      if (op + len > nPixels) return false
      var i = op + len - 1
      c = code
      while (c >= clear) { out(i) = suffix(c); i -= 1; c = prefix(c) }
      out(i) = c
      op += len
      true
    }
    while (op < nPixels) {
      val code = readCode()
      if (code < 0) return null
      if (code == clear) { next = eoi + 1; codeSize = minCodeSize + 1; prev = -1 }
      else if (code == eoi) return null // EOI before the pixel count
      else if (prev == -1) {
        if (code >= clear) return null
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > next) return null
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstOf(if (code == next) prev else code)
          firstCh(next) = firstOf(prev)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else if (code == next) return null // KwKwK needs a free slot
        if (!emit(code)) return null
        prev = code
      }
    }
    out
  }

  /** REAL pixel decode of a GIF87a/89a first frame: color-table
    * lookup over the LZW-decompressed index stream, with the
    * four-pass interlace row order (rows 0/8.., 4/8.., 2/4.., 1/2..)
    * unwoven when the descriptor flags it (the JDK encoder's default)
    * — the third real decompressor of the family (BMP raw, PNG
    * DEFLATE+filters, GIF LZW). Row-major integer luma; None for
    * malformed streams. */
  def decodeGifGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 14 || !startsWith(b, "GIF8", 0)) return None
    try {
      var pos = 13
      var gct: Array[Int] = null
      val packed = b(10) & 0xff
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > b.length) return None
        gct = Array.tabulate(n)(i => (b(pos + i * 3) & 0xff) +
          (b(pos + i * 3 + 1) & 0xff) + (b(pos + i * 3 + 2) & 0xff))
        pos += 3 * n
      }
      while (pos < b.length) {
        (b(pos) & 0xff) match {
          case 0x21 => // extension block: label then sub-blocks
            pos += 2
            while (pos < b.length && (b(pos) & 0xff) != 0)
              pos += 1 + (b(pos) & 0xff)
            pos += 1
          case 0x2c =>
            if (pos + 10 > b.length) return None
            val w = u16le(b, pos + 5)
            val h = u16le(b, pos + 7)
            val ip = b(pos + 9) & 0xff
            pos += 10
            var lum = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (pos + 3 * n > b.length) return None
              lum = Array.tabulate(n)(i => (b(pos + i * 3) & 0xff) +
                (b(pos + i * 3 + 1) & 0xff) + (b(pos + i * 3 + 2) & 0xff))
              pos += 3 * n
            }
            if (lum == null || w <= 0 || h <= 0) return None // no palette
            val minCode = b(pos) & 0xff
            pos += 1
            val data = new java.io.ByteArrayOutputStream()
            while (pos < b.length && (b(pos) & 0xff) != 0) {
              val n = b(pos) & 0xff
              if (pos + 1 + n > b.length) return None
              data.write(b, pos + 1, n)
              pos += 1 + n
            }
            val idx = lzwDecode(data.toByteArray, minCode, w * h)
            if (idx == null || idx.exists(_ >= lum.length)) return None
            val rowOrder: Seq[Int] =
              if ((ip & 0x40) != 0)
                (0 until h by 8) ++ (4 until h by 8) ++
                  (2 until h by 4) ++ (1 until h by 2)
              else 0 until h
            val gray = new Array[Int](w * h)
            var r = 0
            while (r < h) {
              val y = rowOrder(r)
              var x = 0
              while (x < w) {
                gray(y * w + x) = lum(idx(r * w + x))
                x += 1
              }
              r += 1
            }
            return Some((w, h, gray))
          case 0x3b => return None // trailer before any image frame
          case _ => return None
        }
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** [[decodeGifGray]] generalized to EVERY frame of an animated GIF:
    * the same extension-skipping walk and per-frame LZW decode,
    * accumulating `(w, h, luma)` per image descriptor until the
    * trailer. None for malformed streams or zero frames. */
  def decodeGifFrames(b: Array[Byte]): Option[Vector[(Int, Int, Array[Int])]] = {
    if (b == null || b.length < 14 || !startsWith(b, "GIF8", 0)) return None
    try {
      var pos = 13
      var gct: Array[Int] = null
      val packed = b(10) & 0xff
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > b.length) return None
        gct = Array.tabulate(n)(i => (b(pos + i * 3) & 0xff) +
          (b(pos + i * 3 + 1) & 0xff) + (b(pos + i * 3 + 2) & 0xff))
        pos += 3 * n
      }
      val frames = Vector.newBuilder[(Int, Int, Array[Int])]
      var nFrames = 0
      while (pos < b.length) {
        (b(pos) & 0xff) match {
          case 0x21 =>
            pos += 2
            while (pos < b.length && (b(pos) & 0xff) != 0)
              pos += 1 + (b(pos) & 0xff)
            pos += 1
          case 0x2c =>
            if (pos + 10 > b.length) return None
            val w = u16le(b, pos + 5)
            val h = u16le(b, pos + 7)
            val ip = b(pos + 9) & 0xff
            pos += 10
            var lum = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (pos + 3 * n > b.length) return None
              lum = Array.tabulate(n)(i => (b(pos + i * 3) & 0xff) +
                (b(pos + i * 3 + 1) & 0xff) + (b(pos + i * 3 + 2) & 0xff))
              pos += 3 * n
            }
            if (lum == null || w <= 0 || h <= 0) return None
            val minCode = b(pos) & 0xff
            pos += 1
            val data = new java.io.ByteArrayOutputStream()
            while (pos < b.length && (b(pos) & 0xff) != 0) {
              val n = b(pos) & 0xff
              if (pos + 1 + n > b.length) return None
              data.write(b, pos + 1, n)
              pos += 1 + n
            }
            pos += 1 // sub-block terminator
            val idx = lzwDecode(data.toByteArray, minCode, w * h)
            if (idx == null || idx.exists(_ >= lum.length)) return None
            val rowOrder: Seq[Int] =
              if ((ip & 0x40) != 0)
                (0 until h by 8) ++ (4 until h by 8) ++
                  (2 until h by 4) ++ (1 until h by 2)
              else 0 until h
            val gray = new Array[Int](w * h)
            var r = 0
            while (r < h) {
              val y = rowOrder(r)
              var x = 0
              while (x < w) {
                gray(y * w + x) = lum(idx(r * w + x))
                x += 1
              }
              r += 1
            }
            frames += ((w, h, gray))
            nFrames += 1
          case 0x3b =>
            return if (nFrames > 0) Some(frames.result()) else None
          case _ => return None
        }
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Integer pixel statistics over REAL decoded images — BMP pixel
    * arrays and inflate+unfilter PNG streams, with a HASH-EXACT
    * oracle: the fabricated pixel generator is closed-form
    * (`v = doc_id + y·w + x`, luma = sum of v's three low bytes), so
    * DuckDB regenerates every pixel and must agree on every integer.
    * Scan-side encode→decode→fold, zero shuffle. */
  private def gifW(id: Long): Int = (id % 19).toInt + 2
  private def gifH(id: Long): Int = (id % 11).toInt + 2

  def imagePixelStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 != 1) // the two image slices
      .mapPartitions(_.flatMap { id =>
        def fold(fmt: String, d: Option[(Int, Int, Array[Int])]) =
          d.map { case (w, h, gray) =>
            var s = 0L
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var i = 0
            while (i < gray.length) {
              val v = gray(i)
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            (id, fmt, w.toLong * h, s, mn, mx)
          }
        if (id % 3 == 0)
          fold("bmp", decodeBmpGray(encodeBmp(bmpW(id), bmpH(id), id)))
        else // the PNG slice also carries a GIF twin (full LZW round trip)
          fold("png", decodePngGray(encodePng(pngW(id), pngH(id), id))) ++
            fold("gif", decodeGifGray(encodeGif(gifW(id), gifH(id), id)))
      })
      .toDF("media_id", "format", "n_px", "luma_sum", "luma_min", "luma_max")
      .orderBy("media_id", "format")
  }

  /** DuckDB replay of [[imagePixelStats]] from the closed-form pixel
    * generators (BMP/PNG: `v = doc_id + i`, luma = v's three low
    * bytes summed; GIF: grayscale palette, luma = 3·((doc_id + i) mod
    * 256)). */
  val imagePixelStatsSql: String =
    """WITH img AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'bmp' ELSE 'png' END AS format,
      |    CASE doc_id % 3 WHEN 0 THEN (doc_id % 31 + 1)
      |         ELSE (doc_id % 23 + 1) END AS w,
      |    CASE doc_id % 3 WHEN 0 THEN (doc_id % 17 + 1)
      |         ELSE (doc_id % 13 + 1) END AS h
      |  FROM documents WHERE doc_id % 3 <> 1
      |  UNION ALL
      |  SELECT doc_id, 'gif', doc_id % 19 + 2, doc_id % 11 + 2
      |  FROM documents WHERE doc_id % 3 = 2),
      |lum AS (
      |  SELECT doc_id, format, w, h,
      |    CASE WHEN format = 'gif' THEN 3 * ((doc_id + i) % 256)
      |         ELSE ((doc_id + i) % 256) + (((doc_id + i) // 256) % 256)
      |           + (((doc_id + i) // 65536) % 256) END AS l
      |  FROM img, LATERAL unnest(range(0, w * h)) AS t (i))
      |SELECT doc_id AS media_id, format,
      |  (w * h)::BIGINT AS n_px, sum(l)::BIGINT AS luma_sum,
      |  min(l)::INT AS luma_min, max(l)::INT AS luma_max
      |FROM lum GROUP BY doc_id, format, w, h
      |ORDER BY media_id, format""".stripMargin

  /** Audio feature extraction over REAL decoded samples — the audio
    * sibling of [[mediaAhashDedup]]'s pixel path, but with a
    * HASH-EXACT oracle: the fabricated WAV's sample generator is
    * closed-form (`(doc_id + i·257) mod 2¹⁶`, two's-complement), so
    * DuckDB replays the per-sample stream and must agree on every
    * integer. Per document: sample count, min/max sample, energy
    * (Σ v², exact long — no float RMS), and strict zero crossings
    * (`v·prev < 0`). Pure scan-side per-row work: encode → decode →
    * fold inside one `mapPartitions`, zero shuffle. */
  def audioFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 1) // the WAV slice of mediaBinaries
      .mapPartitions(_.flatMap { id =>
        val payload = encodeWav(wavRate(id), wavChannels(id), wavSamples(id), id)
        decodeWavSamples(payload).map { s =>
          var sumSq = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            sumSq += v.toLong * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            if (i > 0 && v.toLong * s(i - 1) < 0) zc += 1
            i += 1
          }
          (id, s.length.toLong, mn, mx, sumSq, zc)
        }
      })
      .toDF("media_id", "n_samples", "min_sample", "max_sample",
        "energy", "zero_crossings")
      .orderBy("media_id")
  }

  /** DuckDB replay of [[audioFeatures]]: regenerate the sample stream
    * from the closed-form generator and fold the same integers. */
  val audioFeaturesSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    ((doc_id % 100 + 1) * (doc_id % 2 + 1))::BIGINT AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT doc_id, i,
      |    CASE WHEN (doc_id + i * 257) % 65536 >= 32768
      |         THEN (doc_id + i * 257) % 65536 - 65536
      |         ELSE (doc_id + i * 257) % 65536 END AS v
      |  FROM w, LATERAL unnest(range(0, n)) AS t (i)),
      |l AS (
      |  SELECT doc_id, i, v,
      |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      |  FROM s)
      |SELECT doc_id AS media_id, count(*) AS n_samples,
      |  min(v)::INT AS min_sample, max(v)::INT AS max_sample,
      |  sum(v * v)::BIGINT AS energy,
      |  sum(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END)::BIGINT
      |    AS zero_crossings
      |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- perceptual dedup

  /** ENGINE-PORTABLE 24-bit mixer — the deterministic pixel/position
    * source for fabricated images. A quadratic-congruential scramble
    * mod the Mersenne prime 2^31−1 (the [[graft.functions.PolyHash62]]
    * modulus family): every intermediate stays below 2^62, so the SAME
    * four-line arithmetic runs overflow-free in plain BIGINT on any
    * SQL engine — which is what lets `media_ahash_dedup` carry a full
    * DuckDB oracle (a splitmix64 mixer would need 64-bit wrapping
    * multiplication, which stock SQL cannot express). The quadratic
    * steps break the affine structure a pure polynomial fold leaves
    * between consecutive indices. */
  private[operators] def mix24(a: Long, b: Long): Long = {
    val M = 2147483647L
    var h = ((a % M) * 131 + b + 7) % M
    h = (h * h % M + h) % M
    h = (h * h % M + 131) % M
    h % 16777216L
  }

  /** A real 24bpp BMP whose pixels are HASH noise of `seed` (unlike
    * [[encodeBmp]]'s ramp, two different seeds give uncorrelated
    * images — the property a perceptual-dedup fixture needs), with
    * `flips` deterministic pixel overwrites keyed by `flipSeed` — the
    * "same image, few pixels retouched" near-duplicate. */
  def encodeBmpHashed(width: Int, height: Int, seed: Long,
      flips: Int = 0, flipSeed: Long = 0L): Array[Byte] = {
    val px = new Array[Int](width * height)
    var i = 0
    while (i < px.length) { px(i) = mix24(seed, i).toInt; i += 1 }
    var f = 0
    while (f < flips) {
      val p = (mix24(flipSeed, f) % px.length).toInt
      px(p) = mix24(flipSeed, 0x10000L + f).toInt
      f += 1
    }
    val rowSize = (width * 3 + 3) & ~3
    val buf = ByteBuffer.allocate(54 + rowSize * height)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * height)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(rowSize * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = px(y * width + x)
        buf.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y += 1
    }
    buf.array()
  }

  /** REAL pixel decode of a 24bpp uncompressed bottom-up BMP: row-major
    * integer luma (r+g+b, deliberately NOT divided — exact). None for
    * anything that isn't a plain 24bpp BMP, or is truncated. */
  def decodeBmpGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = i32le(b, 10)
    val w = i32le(b, 18)
    val h = i32le(b, 22)
    val bpp = u16le(b, 28)
    val compression = i32le(b, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return None
    val rowSize = (w * 3 + 3) & ~3
    if (off < 54 || b.length < off + rowSize * h) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val src = off + (h - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < w) {
        val i = src + x * 3
        gray(y * w + x) = (b(i) & 0xff) + (b(i + 1) & 0xff) + (b(i + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }

  /** 64-bit average hash (aHash): luma means over an 8×8 block grid,
    * bit (i·8+j) set when block (i,j)'s mean exceeds the global mean.
    * The comparison is the cross-multiplication `blockSum · nPixels >
    * totalSum · nBlockPixels` — pure integer, no division, no float,
    * so the hash is bit-reproducible on any platform. Needs w,h ≥ 8. */
  def aHash(w: Int, h: Int, gray: Array[Int]): Option[Long] = {
    if (w < 8 || h < 8) return None
    var total = 0L
    var i = 0
    while (i < gray.length) { total += gray(i); i += 1 }
    val nPix = w.toLong * h
    var hash = 0L
    var bi = 0
    while (bi < 8) {
      val y0 = bi * h / 8; val y1 = (bi + 1) * h / 8
      var bj = 0
      while (bj < 8) {
        val x0 = bj * w / 8; val x1 = (bj + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x); x += 1 }
          y += 1
        }
        val nBlock = (x1 - x0).toLong * (y1 - y0)
        if (s * nPix > total * nBlock) hash |= 1L << (bi * 8 + bj)
        bj += 1
      }
      bi += 1
    }
    Some(hash)
  }

  /** 64-bit difference hash (dHash): luma block sums over a 9-column ×
    * 8-row grid; bit (i·8+j) set when block (i,j)'s mean exceeds block
    * (i,j+1)'s — the LOCAL-GRADIENT sibling of [[aHash]]. aHash
    * thresholds every block against the GLOBAL mean, so large-scale
    * illumination structure (vignetting, a brightness ramp) moves many
    * bits together; dHash encodes only adjacent-block relations, the
    * property that made it the de-facto crawl-dedup hash. Both hashes
    * are exactly invariant under a uniform brightness shift in this
    * integer form (the +c terms cancel in the cross-multiplied
    * compare — asserted in `MediaCodecsSpec`); what dHash additionally
    * survives EXACTLY is any vertical illumination gradient — an
    * offset that depends only on the row adds the same amount to the
    * two compared blocks' means, because horizontally adjacent blocks
    * span identical row ranges (also asserted, against aHash which
    * does flip). Pure integer — no division, no float —
    * bit-reproducible on any platform. Needs w ≥ 9, h ≥ 8. */
  def dHash(w: Int, h: Int, gray: Array[Int]): Option[Long] = {
    if (w < 9 || h < 8) return None
    val s = Array.ofDim[Long](8, 9)
    val n = Array.ofDim[Long](8, 9)
    var bi = 0
    while (bi < 8) {
      val y0 = bi * h / 8; val y1 = (bi + 1) * h / 8
      var bj = 0
      while (bj < 9) {
        val x0 = bj * w / 9; val x1 = (bj + 1) * w / 9
        var acc = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { acc += gray(y * w + x); x += 1 }
          y += 1
        }
        s(bi)(bj) = acc
        n(bi)(bj) = (x1 - x0).toLong * (y1 - y0)
        bj += 1
      }
      bi += 1
    }
    var hv = 0L
    bi = 0
    while (bi < 8) {
      var bj = 0
      while (bj < 8) {
        if (s(bi)(bj) * n(bi)(bj + 1) > s(bi)(bj + 1) * n(bi)(bj))
          hv |= 1L << (bi * 8 + bj)
        bj += 1
      }
      bi += 1
    }
    Some(hv)
  }

  /** Shared banded-hamming pair tail for the perceptual hashes: 16-bit
    * band equi-join (pigeonhole: hamming ≤ 3 of 64 bits agrees exactly
    * on ≥ 1 of 4 bands — NO false negatives at the default threshold)
    * then exact `bit_count(xor)` verify. Input: (media_id, hv). */
  private def bandedHammingPairs(hashes: DataFrame,
      maxHamming: Int): DataFrame = {
    // The 4×16-bit banding is only complete for hamming ≤ 3: a pair at
    // hamming 4 can differ in all four bands and never become a
    // candidate, silently dropping true pairs while the exact-all-pairs
    // oracle keeps them. Fail loudly instead of losing pairs; a larger
    // threshold needs more/narrower bands (maxHamming+1 bands total).
    require(maxHamming <= 3,
      s"bandedHammingPairs: 4-band pigeonhole is complete only for " +
        s"maxHamming <= 3 (got $maxHamming)")
    val bands = hashes.select(col("media_id"), col("hv"),
      explode(expr(
        """transform(sequence(0, 3), b ->
          |  struct(b AS band_idx,
          |    shiftright(hv, b * 16) & 65535 AS band_val))""".stripMargin))
        .as("b"))
      .select(col("media_id"), col("hv"),
        col("b.band_idx"), col("b.band_val"))
    val a = bands.toDF("media_id_a", "hv_a", "band_idx", "band_val")
    val b = bands.toDF("media_id_b", "hv_b", "band_idx", "band_val")
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("media_id_a") < col("media_id_b"))
      .select(col("media_id_a"), col("media_id_b"),
        expr("bit_count(hv_a ^ hv_b)").cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("media_id_a", "media_id_b")
  }

  /** Perceptual image near-dup pairs over a fabricated corpus: one
    * 32×32 hashed-noise BMP per document, where `doc_id % groupMod`
    * picks the base image (so each group of docs shares content) and
    * `doc_id / groupMod` retouches 0–2 pixels — the exact+near dup mix
    * a crawled image corpus has. Pipeline: scan-side pixel decode →
    * aHash (per-row, zero shuffle) → candidate pairs by 16-bit BAND
    * equi-join on the hash (the simhash banding discipline: by
    * pigeonhole, a pair within hamming ≤ 3 of 64 bits agrees exactly
    * on at least one of the 4 bands, so the equi-join has NO false
    * negatives at the default threshold — and ≤ 2 retouched pixels
    * keep observed hamming ≤ 2) → exact `bit_count(xor)` verify,
    * never an all-pairs comparison. HASH-EXACT oracle: the pixel
    * generator is the engine-portable [[mix24]] and the aHash is pure
    * integer arithmetic over those pixels, so [[mediaAhashDedupSql]]
    * regenerates every pixel, block mean, and hash bit in DuckDB and
    * must agree on every pair (the oracle compares per-bit flags
    * all-pairs — by the pigeonhole argument above the band-join output
    * IS exactly the hamming ≤ `maxHamming` pair set, so the two plans
    * are equal as sets). The decode and hash stay cross-checked
    * against the independent JDK ImageIO decoder in `MediaCodecsSpec`.
    * Output: (media_id_a, media_id_b, hamming). */
  def mediaAhashDedup(spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 3, groupMod: Int = 25): DataFrame =
    bandedHammingPairs(perceptualHashes(spark, documents, groupMod,
      aHash), maxHamming)

  /** [[mediaAhashDedup]] with [[dHash]] — the gradient-hash face of
    * the same fixture, plan (scan-side decode+hash, band equi-join,
    * exact verify), and fully-regenerating DuckDB oracle
    * ([[mediaDhashDedupSql]]). */
  def mediaDhashDedup(spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 3, groupMod: Int = 25): DataFrame =
    bandedHammingPairs(perceptualHashes(spark, documents, groupMod,
      dHash), maxHamming)

  /** VIDEO near-dup pairs from per-frame perceptual hashes — the
    * temporal member of the perceptual family ([[mediaAhashDedup]] /
    * [[mediaDhashDedup]] are its single-image siblings): each document
    * is a fabricated multi-frame ANIMATED GIF (2–5 frames of 32×32
    * [[mix24]]-noise; `doc_id % groupMod` picks the base clip so
    * groups share frame content, `doc_id / groupMod` retouches 0–3
    * pixels PER FRAME — re-encodes of the same clip), REALLY encoded
    * ([[encodeGifAnimated]]) and REALLY decoded back
    * ([[decodeGifFrames]] — the full LZW walk, per row), then every
    * frame [[dHash]]ed. Two videos are near-dups when ≥
    * `minMatchFrac` of the SHORTER video's frames have a
    * hamming ≤ `maxHamming` partner in the other — the
    * frame-vote rule video-dedup pipelines use (order-agnostic, so
    * re-cuts and trims still match).
    *
    * Scale shape: frame hashing is per-row flatMap work (zero
    * shuffle); candidates come from the SAME 16-bit band equi-join as
    * the image faces, now at frame granularity (pigeonhole: complete
    * for hamming ≤ 3), and the video-level vote is one
    * (pair)-keyed aggregate over candidate frame matches — never an
    * all-pairs comparison of videos or frames. HASH-EXACT oracle:
    * [[mediaVideoDedupSql]] regenerates every frame pixel, flip, dHash
    * bit, band key, and the same vote in DuckDB — the two plans are
    * equal as sets by the pigeonhole argument. Output:
    * (media_id_a, media_id_b, nf_a, nf_b, n_match, score). */
  def mediaVideoDedup(spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 3, minMatchFrac: Double = 0.5,
      groupMod: Int = 25): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole is complete only for maxHamming <= 3")
    import spark.implicits._
    val frames = documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val nf = (id % 4).toInt + 2
        val fpx = Array.tabulate(nf) { f =>
          val base = Array.tabulate(1024)(g =>
            (mix24((id % groupMod) + 1000003L * f, g) % 256).toInt)
          val r = ((id / groupMod) % 4).toInt
          val fs = id * 131 + f
          var j = 0
          while (j < r) {
            val p = (mix24(fs, j) % 1024).toInt
            base(p) = (mix24(fs, 65536L + j) % 256).toInt
            j += 1
          }
          base
        }
        val payload = encodeGifAnimated(32, 32, fpx)
        decodeGifFrames(payload) match {
          case Some(fr) => fr.iterator.zipWithIndex.flatMap {
            case ((w, h, gray), f) =>
              dHash(w, h, gray).map(hv => (id, f.toLong, nf.toLong, hv))
          }
          case None => Iterator.empty
        }
      }).toDF("media_id", "frame_idx", "nf", "hv")
    val bands = frames.select(col("media_id"), col("frame_idx"),
      col("nf"), col("hv"),
      explode(expr(
        """transform(sequence(0, 3), b ->
          |  struct(b AS band_idx,
          |    shiftright(hv, b * 16) & 65535 AS band_val))""".stripMargin))
        .as("b"))
      .select(col("media_id"), col("frame_idx"), col("nf"), col("hv"),
        col("b.band_idx"), col("b.band_val"))
    val a = bands.toDF("ma", "fa", "nfa", "hva", "band_idx", "band_val")
    val bb = bands.toDF("mb", "fb", "nfb", "hvb", "band_idx", "band_val")
    val fmatch = a.join(bb, Seq("band_idx", "band_val"))
      .where(col("ma") < col("mb"))
      .select(col("ma"), col("fa"), col("nfa"),
        col("mb"), col("fb"), col("nfb"),
        expr("bit_count(hva ^ hvb)").cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    fmatch
      .groupBy(col("ma").as("media_id_a"), col("mb").as("media_id_b"),
        col("nfa").as("nf_a"), col("nfb").as("nf_b"))
      // vote on the SHORTER side's frames (ties: a) so score ≤ 1
      .agg(countDistinct(when(col("nfa") <= col("nfb"), col("fa"))
        .otherwise(col("fb"))).as("n_match"))
      .withColumn("score",
        col("n_match").cast("double") /
          least(col("nf_a"), col("nf_b")).cast("double"))
      .where(col("score") >= minMatchFrac)
      .select(col("media_id_a"), col("media_id_b"), col("nf_a"),
        col("nf_b"), col("n_match"), col("score"))
      .orderBy("media_id_a", "media_id_b")
  }

  /** DuckDB replay of [[mediaVideoDedup]]: regenerate the per-frame
    * [[mix24]] pixel noise and flips (descending-j CASE so the
    * encoder's last-write-wins collision order replays), fold the
    * dHash 8×9 block relations per frame (GIF decode is top-down —
    * no BMP row flip), re-derive the four 16-bit band keys by bit
    * fold, band-join candidates, verify hamming, and take the same
    * shorter-side frame vote. */
  def mediaVideoDedupSql(maxHamming: Int = 3, minMatchFrac: Double = 0.5,
      groupMod: Int = 25): String = {
    val M = 2147483647L
    s"""WITH vids AS (
       |  SELECT doc_id, (doc_id % 4) + 2 AS nf FROM documents),
       |vf AS (SELECT doc_id, nf, t.f
       |  FROM vids, LATERAL unnest(range(0, nf)) t(f)),
       |q0 AS (SELECT doc_id, nf, f, t.g,
       |    ((((doc_id % $groupMod) + 1000003 * f) % $M) * 131 + t.g + 7)
       |      % $M AS h
       |  FROM vf, LATERAL unnest(range(0, 1024)) t(g)),
       |q1 AS (SELECT doc_id, nf, f, g, (h * h % $M + h) % $M AS h FROM q0),
       |q2 AS (SELECT doc_id, nf, f, g,
       |    (((h * h % $M + 131) % $M) % 16777216) % 256 AS idx FROM q1),
       |fj AS (SELECT doc_id, f, vj.j FROM vf,
       |  (VALUES (0), (1), (2), (65536), (65537), (65538)) vj(j)),
       |g0 AS (SELECT doc_id, f, j,
       |    (((doc_id * 131 + f) % $M) * 131 + j + 7) % $M AS h FROM fj),
       |g1 AS (SELECT doc_id, f, j, (h * h % $M + h) % $M AS h FROM g0),
       |g2 AS (SELECT doc_id, f, j,
       |    ((h * h % $M + 131) % $M) % 16777216 AS v FROM g1),
       |fl AS (SELECT doc_id, f,
       |    MAX(CASE WHEN j = 0 THEN v % 1024 END) AS pos0,
       |    MAX(CASE WHEN j = 1 THEN v % 1024 END) AS pos1,
       |    MAX(CASE WHEN j = 2 THEN v % 1024 END) AS pos2,
       |    MAX(CASE WHEN j = 65536 THEN v % 256 END) AS val0,
       |    MAX(CASE WHEN j = 65537 THEN v % 256 END) AS val1,
       |    MAX(CASE WHEN j = 65538 THEN v % 256 END) AS val2
       |  FROM g2 GROUP BY 1, 2),
       |pxl AS (SELECT q.doc_id, q.nf, q.f, q.g,
       |    3 * (CASE
       |      WHEN ((q.doc_id // $groupMod) % 4) >= 3 AND q.g = fl.pos2
       |        THEN fl.val2
       |      WHEN ((q.doc_id // $groupMod) % 4) >= 2 AND q.g = fl.pos1
       |        THEN fl.val1
       |      WHEN ((q.doc_id // $groupMod) % 4) >= 1 AND q.g = fl.pos0
       |        THEN fl.val0
       |      ELSE q.idx END) AS l
       |  FROM q2 q JOIN fl ON q.doc_id = fl.doc_id AND q.f = fl.f),
       |dsum AS (SELECT doc_id, nf, f,
       |    (g // 32) // 4 AS bi, ((g % 32) * 9 + 8) // 32 AS bj,
       |    sum(l) AS s, count(*) AS n
       |  FROM pxl GROUP BY 1, 2, 3, 4, 5),
       |bits AS (SELECT a.doc_id, a.nf, a.f, a.bi * 8 + a.bj AS bit,
       |    CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS fbit
       |  FROM dsum a JOIN dsum b
       |    ON a.doc_id = b.doc_id AND a.f = b.f AND a.bi = b.bi
       |      AND b.bj = a.bj + 1),
       |fb AS (SELECT doc_id, nf, f, bit // 16 AS band_idx,
       |    SUM(fbit * (1::BIGINT << (bit % 16)))::BIGINT AS band_val
       |  FROM bits GROUP BY 1, 2, 3, 4),
       |cand AS (SELECT DISTINCT a.doc_id AS ma, a.f AS fa, a.nf AS nfa,
       |    b.doc_id AS mb, b.f AS fb, b.nf AS nfb
       |  FROM fb a JOIN fb b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |      AND a.doc_id < b.doc_id),
       |ham AS (SELECT c.ma, c.fa, c.nfa, c.mb, c.fb, c.nfb,
       |    CAST(sum(CASE WHEN x.fbit <> y.fbit THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hamming
       |  FROM cand c
       |  JOIN bits x ON x.doc_id = c.ma AND x.f = c.fa
       |  JOIN bits y ON y.doc_id = c.mb AND y.f = c.fb AND y.bit = x.bit
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |agg AS (SELECT ma AS media_id_a, mb AS media_id_b,
       |    nfa::BIGINT AS nf_a, nfb::BIGINT AS nf_b,
       |    count(DISTINCT CASE WHEN nfa <= nfb THEN fa ELSE fb END)
       |      ::BIGINT AS n_match
       |  FROM ham WHERE hamming <= $maxHamming GROUP BY 1, 2, 3, 4)
       |SELECT media_id_a, media_id_b, nf_a, nf_b, n_match,
       |  CAST(n_match AS DOUBLE) / CAST(least(nf_a, nf_b) AS DOUBLE)
       |    AS score
       |FROM agg
       |WHERE CAST(n_match AS DOUBLE) / CAST(least(nf_a, nf_b) AS DOUBLE)
       |  >= $minMatchFrac
       |ORDER BY media_id_a, media_id_b""".stripMargin
  }

  /** Shared fixture→hash stage: fabricate each doc's 32×32 hashed-noise
    * BMP, REALLY decode it, hash with `hashFn` — per-row, zero
    * shuffle. */
  private def perceptualHashes(spark: SparkSession, documents: DataFrame,
      groupMod: Int,
      hashFn: (Int, Int, Array[Int]) => Option[Long]): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val payload = encodeBmpHashed(32, 32, seed = id % groupMod,
          flips = ((id / groupMod) % 3).toInt, flipSeed = id)
        for {
          (w, h, gray) <- decodeBmpGray(payload)
          hv <- hashFn(w, h, gray)
        } yield (id, hv)
      }).toDF("media_id", "hv")
  }

  /** DuckDB replay of [[mediaAhashDedup]]: regenerate the [[mix24]]
    * pixels (three chained CTE stages — the quadratic steps would
    * otherwise duplicate subexpressions exponentially), apply the
    * flip overwrites (f=1 checked before f=0, matching the encoder's
    * overwrite order on position collision), fold the 8×8 block sums
    * with the decode's bottom-up row flip (`bi = (31 − g÷32) ÷ 4`),
    * set each hash bit by the same cross-multiplied integer compare,
    * and count differing bits all-pairs. */
  def mediaAhashDedupSql(maxHamming: Int = 3, groupMod: Int = 25): String =
    s"""WITH ${mediaPixelCtes(groupMod)},
       |blocks AS (SELECT doc_id,
       |    (31 - g // 32) // 4 AS bi, (g % 32) // 4 AS bj, sum(l) AS s
       |  FROM pxl GROUP BY 1, 2, 3),
       |tot AS (SELECT doc_id, sum(l) AS total FROM pxl GROUP BY 1),
       |bits AS (SELECT b.doc_id, b.bi * 8 + b.bj AS bit,
       |    CASE WHEN b.s * 1024 > t.total * 16 THEN 1 ELSE 0 END AS fbit
       |  FROM blocks b JOIN tot t USING (doc_id)),
       |${hammingTail(maxHamming)}""".stripMargin

  /** DuckDB replay of [[mediaDhashDedup]]: the shared regenerated
    * pixel stream, 9×8 block sums+counts (the 9-column grid has
    * unequal widths, so counts ride along for the cross-multiplied
    * mean compare; the column index inverts `x0 = ⌊32j/9⌋` as
    * `j = ⌊(9x+8)/32⌋`), one adjacent-column self-join per bit. */
  def mediaDhashDedupSql(maxHamming: Int = 3, groupMod: Int = 25): String =
    s"""WITH ${mediaPixelCtes(groupMod)},
       |dsum AS (SELECT doc_id,
       |    (31 - g // 32) // 4 AS bi,
       |    ((g % 32) * 9 + 8) // 32 AS bj,
       |    sum(l) AS s, count(*) AS n
       |  FROM pxl GROUP BY 1, 2, 3),
       |bits AS (SELECT a.doc_id, a.bi * 8 + a.bj AS bit,
       |    CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS fbit
       |  FROM dsum a JOIN dsum b
       |    ON a.doc_id = b.doc_id AND a.bi = b.bi AND b.bj = a.bj + 1),
       |${hammingTail(maxHamming)}""".stripMargin

  /** Shared DuckDB CTEs regenerating the fabricated corpus's pixel
    * stream — [[mix24]] noise (three chained stages so the quadratic
    * steps don't duplicate subexpressions), flip overwrites (f=1
    * checked before f=0, matching the encoder's overwrite order on
    * position collision), 24-bit → luma fold. Ends with
    * `pxl(doc_id, g, l)` where `g` is the raw ENCODED pixel index
    * (consumers apply the decode's bottom-up row flip:
    * display row = `31 − g ÷ 32`). */
  private def mediaPixelCtes(groupMod: Int): String = {
    val M = 2147483647L
    s"""ids AS (SELECT doc_id FROM documents),
       |px0 AS (SELECT doc_id, t.g,
       |    ((doc_id % $groupMod) * 131 + t.g + 7) % $M AS h
       |  FROM ids, LATERAL unnest(range(0, 1024)) t(g)),
       |px1 AS (SELECT doc_id, g, (h * h % $M + h) % $M AS h FROM px0),
       |px2 AS (SELECT doc_id, g,
       |    ((h * h % $M + 131) % $M) % 16777216 AS v FROM px1),
       |fk AS (SELECT doc_id, f
       |  FROM ids, (VALUES (0), (1), (65536), (65537)) vf(f)),
       |f0 AS (SELECT doc_id, f,
       |    ((doc_id % $M) * 131 + f + 7) % $M AS h FROM fk),
       |f1 AS (SELECT doc_id, f, (h * h % $M + h) % $M AS h FROM f0),
       |f2 AS (SELECT doc_id, f,
       |    ((h * h % $M + 131) % $M) % 16777216 AS v FROM f1),
       |fl AS (SELECT doc_id,
       |    MAX(CASE WHEN f = 0 THEN v % 1024 END) AS pos0,
       |    MAX(CASE WHEN f = 1 THEN v % 1024 END) AS pos1,
       |    MAX(CASE WHEN f = 65536 THEN v END) AS val0,
       |    MAX(CASE WHEN f = 65537 THEN v END) AS val1
       |  FROM f2 GROUP BY 1),
       |pmx AS (SELECT p.doc_id, p.g,
       |    CASE WHEN ((p.doc_id // $groupMod) % 3) >= 2
       |              AND p.g = fl.pos1 THEN fl.val1
       |         WHEN ((p.doc_id // $groupMod) % 3) >= 1
       |              AND p.g = fl.pos0 THEN fl.val0
       |         ELSE p.v END AS v
       |  FROM px2 p JOIN fl USING (doc_id)),
       |pxl AS (SELECT doc_id, g,
       |    (v % 256) + ((v // 256) % 256) + ((v // 65536) % 256) AS l
       |  FROM pmx)""".stripMargin
  }

  /** Shared all-pairs hamming tail over a `bits(doc_id, bit, fbit)`
    * CTE (the oracle side needs no banding — by pigeonhole the banded
    * plan's output IS the hamming ≤ `maxHamming` pair set). */
  private def hammingTail(maxHamming: Int): String =
    s"""ham AS (SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
       |    CAST(sum(CASE WHEN a.fbit <> b.fbit THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON a.bit = b.bit AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT media_id_a, media_id_b, hamming FROM ham
       |WHERE hamming <= $maxHamming
       |ORDER BY media_id_a, media_id_b""".stripMargin
}
