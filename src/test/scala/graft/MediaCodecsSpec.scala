package graft

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaCodecs, MediaMeta}

/** [[MediaCodecs.parse]] proved against the JDK's own encoders
  * (ImageIO, AudioSystem) — an INDEPENDENT implementation of each
  * container format, so a symmetric bug in our encode/parse pair
  * cannot hide. Then the round-trip over our writers, the corrupt-input
  * contract, and the Spark query face. */
class MediaCodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeBmpGray + aHash agree with an independent ImageIO pixel decode") {
    val payload = MediaCodecs.encodeBmpHashed(32, 24, seed = 7,
      flips = 2, flipSeed = 99)
    val Some((w, h, gray)) = MediaCodecs.decodeBmpGray(payload)
    assert((w, h) === ((32, 24)))
    // independent decoder: JDK ImageIO reads the same bytes
    val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img.getWidth === 32 && img.getHeight === 24)
    val jdkGray = for (y <- 0 until h; x <- 0 until w) yield {
      val rgb = img.getRGB(x, y)
      ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    assert(gray.toSeq === jdkGray)
    // the hash is a pure function of the pixels both decoders agree on
    assert(MediaCodecs.aHash(w, h, gray) ===
      MediaCodecs.aHash(w, h, jdkGray.toArray))
  }

  test("decodePngGray: our encoder, the JDK encoder, and all five filter types") {
    // our encoder (filter None, color type 2)
    val Some((w1, h1, g1)) = MediaCodecs.decodePngGray(
      MediaCodecs.encodePng(9, 5, seed = 3))
    assert((w1, h1) === ((9, 5)))
    assert(g1(0) === (3 % 256) + ((3 / 256) % 256) + ((3 / 65536) % 256))

    // an INDEPENDENTLY-encoded PNG (JDK ImageIO) with known pixels:
    // decode must reproduce them whatever filters the JDK chose
    val img = new java.awt.image.BufferedImage(17, 11,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 11).foreach(y => (0 until 17).foreach { x =>
      img.setRGB(x, y, ((x * 37 + y * 101) % 0x1000000))
    })
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val Some((w2, h2, g2)) = MediaCodecs.decodePngGray(bos.toByteArray)
    assert((w2, h2) === ((17, 11)))
    (0 until 11).foreach(y => (0 until 17).foreach { x =>
      val rgb = img.getRGB(x, y)
      val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      assert(g2(y * 17 + x) === lum, s"($x,$y)")
    })

    // every filter type 0-4 decoded against a hand-FORWARD-filtered
    // stream (independent reimplementation of the RFC formulas)
    val w = 4; val h = 5; val bpp = 3
    val pix = Array.tabulate(h, w * bpp)((y, i) => (y * 59 + i * 23) % 256)
    def fwd(f: Int, y: Int): Array[Byte] = {
      def a(i: Int) = if (i >= bpp) pix(y)(i - bpp) else 0
      def up(i: Int) = if (y > 0) pix(y - 1)(i) else 0
      def c(i: Int) = if (y > 0 && i >= bpp) pix(y - 1)(i - bpp) else 0
      Array.tabulate(w * bpp) { i =>
        val x = pix(y)(i)
        val out = f match {
          case 0 => x
          case 1 => x - a(i)
          case 2 => x - up(i)
          case 3 => x - (a(i) + up(i)) / 2
          case 4 =>
            val p = a(i) + up(i) - c(i)
            val pa = math.abs(p - a(i)); val pb = math.abs(p - up(i))
            val pc = math.abs(p - c(i))
            x - (if (pa <= pb && pa <= pc) a(i) else if (pb <= pc) up(i) else c(i))
          case _ => fail(s"bad filter $f")
        }
        (out & 0xff).toByte
      }
    }
    val filters = Seq(0, 1, 2, 3, 4)
    val raw = filters.zipWithIndex.flatMap { case (f, y) =>
      f.toByte +: fwd(f, y).toSeq }.toArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + body.length)
      out.putInt(body.length).put(tag.getBytes).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(out.array(), 4, 4 + body.length)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val png = Array(137.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      13.toByte, 10.toByte, 26.toByte, 10.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((w3, h3, g3)) = MediaCodecs.decodePngGray(png)
    assert((w3, h3) === ((w, h)))
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val exp = pix(y)(x * 3) + pix(y)(x * 3 + 1) + pix(y)(x * 3 + 2)
      assert(g3(y * w + x) === exp, s"filter row $y, x=$x")
    })

    // corrupt inputs are data
    assert(MediaCodecs.decodePngGray(null) === None)
    assert(MediaCodecs.decodePngGray(png.take(30)) === None)
    assert(MediaCodecs.decodePngGray("not a png at all".getBytes) === None)
  }

  test("decodeGifGray: LZW decode agrees with JDK-encoded GIFs, incl. code growth") {
    def jdkGif(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      // an indexed image with a full 256-entry grayscale-ish palette
      val r = Array.tabulate(256)(i => i.toByte)
      val g = Array.tabulate(256)(i => ((i * 3) % 256).toByte)
      val bl = Array.tabulate(256)(i => ((i * 7) % 256).toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, r, g, bl)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        img.getRaster.setSample(x, y, 0, px(x, y) & 0xff)
      })
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "gif", bos)
      bos.toByteArray
    }
    // small structured image, then a larger noisy one that forces the
    // LZW code width to grow past 9 bits (and the KwKwK case to occur)
    for ((w, h, f) <- Seq(
      (11, 7, (x: Int, y: Int) => (x * 5 + y * 11) % 256),
      (64, 48, (x: Int, y: Int) => (x * x * 31 + y * 17 + (x * y) % 13) % 256),
      (16, 16, (_: Int, _: Int) => 42))) { // constant: KwKwK chains
      val payload = jdkGif(w, h, f)
      val Some((gw, gh, gray)) = MediaCodecs.decodeGifGray(payload)
      assert((gw, gh) === ((w, h)))
      val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        assert(gray(y * w + x) === lum, s"($x,$y) of ${w}x$h")
      })
    }
    // our own writer round-trips, and the INDEPENDENT JDK reader
    // accepts its uncompressed-LZW stream byte-for-byte
    val ours = MediaCodecs.encodeGif(13, 9, seed = 77)
    val Some((ow, oh, og)) = MediaCodecs.decodeGifGray(ours)
    assert((ow, oh) === ((13, 9)))
    (0 until 13 * 9).foreach(i =>
      assert(og(i) === 3 * ((77 + i) % 256), s"px $i"))
    val jdkRead = ImageIO.read(new java.io.ByteArrayInputStream(ours))
    (0 until 9).foreach(y => (0 until 13).foreach { x =>
      val rgb = jdkRead.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff) ===
        og(y * 13 + x), s"jdk ($x,$y)")
    })
    // a >254-pixel image exercises the mid-stream CLEAR path
    val big = MediaCodecs.encodeGif(30, 20, seed = 5)
    val Some((_, _, bg)) = MediaCodecs.decodeGifGray(big)
    (0 until 600).foreach(i => assert(bg(i) === 3 * ((5 + i) % 256)))

    // corrupt inputs are data
    assert(MediaCodecs.decodeGifGray(null) === None)
    assert(MediaCodecs.decodeGifGray("GIF89a".getBytes) === None)
    assert(MediaCodecs.decodeGifGray(jdkGif(8, 8,
      (x, y) => x + y).take(40)) === None)
  }

  test("decodeWavSamples agrees with the independent JDK AudioSystem decode") {
    val payload = MediaCodecs.encodeWav(16000, 2, 50, seed = 41)
    val Some(ours) = MediaCodecs.decodeWavSamples(payload)
    assert(ours.length === 100)
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val raw = ais.readAllBytes()
    val jdk = Array.tabulate(raw.length / 2)(i =>
      ((raw(i * 2) & 0xff) | (raw(i * 2 + 1) << 8)).toShort)
    assert(ais.getFormat.isBigEndian === false)
    assert(ours.toSeq === jdk.toSeq)
    // non-PCM16 / corrupt payloads are None, never exceptions
    assert(MediaCodecs.decodeWavSamples("RIFFxxxxWAVE".getBytes) === None)
    assert(MediaCodecs.decodeWavSamples(null) === None)
    // a corrupt data-chunk size near 2^31 must not wrap the bounds
    // check into passing (Int overflow) and OOM the task
    val evil = payload.clone()
    val dataPos = { // locate the data chunk's size field
      var p = 12
      while (!(evil(p) == 'd' && evil(p + 1) == 'a' &&
        evil(p + 2) == 't' && evil(p + 3) == 'a')) p += 1
      p + 4
    }
    val hugeLen = Int.MaxValue - 10 // dataOff + hugeLen wraps negative
    evil(dataPos) = (hugeLen & 0xff).toByte
    evil(dataPos + 1) = ((hugeLen >> 8) & 0xff).toByte
    evil(dataPos + 2) = ((hugeLen >> 16) & 0xff).toByte
    evil(dataPos + 3) = ((hugeLen >> 24) & 0xff).toByte
    assert(MediaCodecs.decodeWavSamples(evil) === None)
  }

  test("audioFeatures: hand-computed fold over a tiny known stream") {
    import spark.implicits._
    // doc_id = 1: rate 9000, 2 channels, 2 samples/ch -> 4 samples
    // v_i = (1 + 257 i) mod 2^16 two's-complement: 1, 258, 515, 772
    val got = MediaCodecs.audioFeatures(spark, Seq(1L).toDF("doc_id"))
      .as[(Long, Long, Int, Int, Long, Long)].collect().toList
    val expEnergy = 1L * 1 + 258L * 258 + 515L * 515 + 772L * 772
    assert(got === List((1L, 4L, 1, 772, expEnergy, 0L)))
  }

  test("aHash: flat image hashes to 0; half-bright image sets exactly the bright half") {
    assert(MediaCodecs.aHash(16, 16, Array.fill(256)(100)) === Some(0L))
    // left half luma 0, right half 200 -> right 4 blocks of each row set
    val gray = Array.tabulate(256)(i => if (i % 16 < 8) 0 else 200)
    val Some(hv) = MediaCodecs.aHash(16, 16, gray)
    assert(java.lang.Long.bitCount(hv) === 32)
    (0 until 8).foreach { bi =>
      (0 until 8).foreach { bj =>
        assert((((hv >> (bi * 8 + bj)) & 1L) === 1L) === (bj >= 4))
      }
    }
    assert(MediaCodecs.aHash(4, 16, Array.fill(64)(1)) === None, "w < 8")
  }

  test("mediaAhashDedup: same-content groups pair up, different content stays apart") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val pairs = MediaCodecs.mediaAhashDedup(spark, docs, maxHamming = 3,
      groupMod = 25).as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // every pair shares its base image (same doc_id % 25) — hashed-noise
    // bases are uncorrelated, so cross-group hamming is far above 3
    pairs.foreach { case (a, b, ham) =>
      assert(a % 25 === b % 25, s"cross-content pair ($a, $b)")
      assert(ham >= 0 && ham <= 3)
    }
    // unretouched docs (doc_id / 25 % 3 == 0) with the same base are
    // byte-identical images: hamming 0 pairs must all be present
    val exact = (0L until 120L).filter(id => (id / 25) % 3 == 0)
      .groupBy(_ % 25).values.flatMap(g =>
        for (a <- g; b <- g if a < b) yield (a, b)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(exact.subsetOf(got),
      s"missing exact pairs: ${(exact -- got).take(5)}")
    pairs.filter(p => exact((p._1, p._2))).foreach(p => assert(p._3 === 0L))
  }

  test("dHash: gradient bits, brightness-shift invariance, vertical-ramp invariance") {
    // left-to-right luma ramp per 32-wide row: every adjacent-block
    // compare is left < right -> no bits set; reversed ramp sets all 64
    val w = 32; val h = 32
    val inc = Array.tabulate(w * h)(i => (i % w) * 10)
    assert(MediaCodecs.dHash(w, h, inc) === Some(0L))
    val dec = Array.tabulate(w * h)(i => (w - 1 - i % w) * 10)
    assert(MediaCodecs.dHash(w, h, dec).map(java.lang.Long.bitCount) ===
      Some(64))
    // a structured image: same hash after a uniform brightness shift
    val img = Array.tabulate(w * h)(i =>
      (((i * 1103515245L + 12345L) >>> 16) & 0x3ff).toInt)
    val shifted = img.map(_ + 57)
    assert(MediaCodecs.dHash(w, h, img) === MediaCodecs.dHash(w, h, shifted))
    // a VERTICAL illumination ramp (offset depends only on the row)
    // leaves dHash exactly unchanged — horizontally adjacent blocks
    // span identical rows — while aHash flips bits (top rows now all
    // exceed the global mean)
    val ramped = Array.tabulate(w * h)(i => img(i) + (i / w) * 25)
    assert(MediaCodecs.dHash(w, h, ramped) === MediaCodecs.dHash(w, h, img))
    assert(MediaCodecs.aHash(w, h, ramped) !== MediaCodecs.aHash(w, h, img))
    assert(MediaCodecs.dHash(8, 16, Array.fill(128)(1)) === None, "w < 9")
  }

  test("mediaDhashDedup: same-content groups pair up, different content stays apart") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val pairs = MediaCodecs.mediaDhashDedup(spark, docs, maxHamming = 3,
      groupMod = 25).as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, ham) =>
      assert(a % 25 === b % 25, s"cross-content pair ($a, $b)")
      assert(ham >= 0 && ham <= 3)
    }
    // byte-identical images must pair at hamming 0
    val exact = (0L until 120L).filter(id => (id / 25) % 3 == 0)
      .groupBy(_ % 25).values.flatMap(g =>
        for (a <- g; b <- g if a < b) yield (a, b)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(exact.subsetOf(got),
      s"missing exact pairs: ${(exact -- got).take(5)}")
  }

  private def jdkImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  test("parses JDK-encoded BMP / PNG / GIF / JPEG headers") {
    val bmp = MediaCodecs.parse(1L, jdkImage("bmp", 37, 23))
    assert(bmp === MediaMeta(1L, "bmp", Some(37), Some(23), Some(24), Some(3), None, None))
    val png = MediaCodecs.parse(2L, jdkImage("png", 64, 48))
    assert(png.format === "png" && png.width === Some(64) && png.height === Some(48))
    assert(png.bit_depth === Some(8) && png.channels === Some(3))
    val gif = MediaCodecs.parse(3L, jdkImage("gif", 19, 7))
    assert(gif.format === "gif" && gif.width === Some(19) && gif.height === Some(7))
    val jpg = MediaCodecs.parse(4L, jdkImage("jpg", 100, 50))
    assert(jpg.format === "jpeg" && jpg.width === Some(100) && jpg.height === Some(50))
    assert(jpg.bit_depth === Some(8) && jpg.channels === Some(3))
  }

  test("parses a JDK-encoded WAV: rate, channels, bits, duration") {
    val rate = 16000
    val pcm = new Array[Byte](rate * 2 * 2) // 1 s, stereo 16-bit
    val fmt = new AudioFormat(rate.toFloat, 16, 2, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, (pcm.length / 4).toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val got = MediaCodecs.parse(9L, bos.toByteArray)
    assert(got === MediaMeta(9L, "wav", None, None, Some(16), Some(2),
      Some(rate), Some(1000L)))
  }

  test("own writers round-trip, and their files open in JDK readers") {
    val bmp = MediaCodecs.encodeBmp(31, 17, seed = 42L)
    assert(MediaCodecs.parse(1L, bmp) ===
      MediaMeta(1L, "bmp", Some(31), Some(17), Some(24), Some(3), None, None))
    val png = MediaCodecs.encodePng(23, 13, seed = 7L)
    assert(MediaCodecs.parse(2L, png) ===
      MediaMeta(2L, "png", Some(23), Some(13), Some(8), Some(3), None, None))
    val wav = MediaCodecs.encodeWav(11000, 2, 55, seed = 3L)
    assert(MediaCodecs.parse(3L, wav) ===
      MediaMeta(3L, "wav", None, None, Some(16), Some(2), Some(11000),
        Some(55L * 2 * 2 * 1000 / (11000 * 2 * 2))))
    // the cross-check in reverse: JDK readers accept OUR files
    val bmpImg = ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(bmpImg.getWidth === 31 && bmpImg.getHeight === 17)
    val pngImg = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(pngImg.getWidth === 23 && pngImg.getHeight === 13)
    val wavIn = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(wavIn.getFormat.getSampleRate === 11000f &&
      wavIn.getFormat.getChannels === 2)
  }

  test("corrupt / truncated / unknown payloads are data, not exceptions") {
    val cases = Seq[Array[Byte]](
      null, Array.emptyByteArray, Array[Byte](1, 2, 3),
      "BMxxxxxxxxxxxx".getBytes, // BMP magic, truncated header
      "RIFF\u0000\u0000\u0000\u0000WAVExxxx".getBytes, // WAV, no fmt chunk
      // WAV whose chunk size field is -8: the chunk walk would advance by
      // zero and hang the task forever if negative sizes weren't rejected
      ("RIFF" + "\u0000" * 4 + "WAVEJUNK").getBytes ++
        Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
        Array.fill[Byte](8)(0),
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0, 0, 13),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte,
        0, 2, 0, 0, 0, 0, 0, 0)) // JPEG that hits SOS before SOF
    cases.zipWithIndex.foreach { case (payload, i) =>
      val got = MediaCodecs.parse(i.toLong, payload)
      assert(got.format === "unknown", s"case $i: $got")
      assert(got.width.isEmpty && got.sample_rate.isEmpty)
    }
  }

  test("media_metadata query: real files built and parsed back at corpus scale") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val got = MediaCodecs.mediaMetadata(spark, docs)
    assert(got.count() === docs.count())
    // every payload parsed: no unknowns, and each format's fields present
    assert(got.where(col("format") === "unknown").count() === 0)
    val byFormat = got.groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFormat.keySet === Set("bmp", "wav", "png"))
    assert(got.where(col("format") === "wav" && col("duration_ms").isNull)
      .count() === 0)
    assert(got.where(col("format") =!= "wav" && col("width").isNull)
      .count() === 0)
  }

  test("animated GIF: every frame round-trips and agrees with the JDK frame reader") {
    import graft.operators.MediaCodecs
    // three distinct deterministic frames
    val frames = Array.tabulate(3)(f =>
      Array.tabulate(32 * 32)(g => (f * 83 + g * 7) % 256))
    val payload = MediaCodecs.encodeGifAnimated(32, 32, frames)
    // our decoder: all frames, luma = 3 * index
    val ours = MediaCodecs.decodeGifFrames(payload).get
    assert(ours.length === 3)
    ours.zipWithIndex.foreach { case ((w, h, gray), f) =>
      assert((w, h) === ((32, 32)))
      assert(gray.toSeq === frames(f).map(_ * 3).toSeq, s"frame $f")
    }
    // the single-frame face still reads frame 0
    assert(MediaCodecs.decodeGifGray(payload).get._3.toSeq
      === frames(0).map(_ * 3).toSeq)
    // independent JDK reader: same per-frame pixels (palette r=g=b=idx,
    // so any channel == index)
    val it = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
    assert(it.hasNext, "JDK has no gif reader")
    val reader = it.next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload)))
    assert(reader.getNumImages(true) === 3)
    (0 until 3).foreach { f =>
      val img = reader.read(f)
      val jdk = Array.tabulate(32 * 32)(g =>
        (img.getRGB(g % 32, g / 32) & 0xff) * 3)
      assert(jdk.toSeq === ours(f)._3.toSeq, s"JDK frame $f")
    }
  }

  test("mediaVideoDedup: same-clip groups vote together, r=0 twins score 1.0") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 18 videos, groupMod=3 -> 3 clips x 6 re-encodes. With gm=3,
    // nf = id%4+2 VARIES inside a group (unequal-frame-count pairs
    // exercise the shorter-side vote denominator) and id/3 reaches 3
    // (the r=3 three-flips-per-frame branch, whose last-write-wins
    // collision order the oracle replays with a descending CASE).
    val docs = (0L until 18L).toDF("doc_id")
    val out = graft.operators.MediaCodecs
      .mediaVideoDedup(spark, docs, groupMod = 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Long]("media_id_a"); val b = r.getAs[Long]("media_id_b")
      assert(a % 3 === b % 3, s"cross-clip pair ($a,$b)")
      assert(r.getAs[Double]("score") >= 0.5 && r.getAs[Double]("score") <= 1.0)
      assert(r.getAs[Long]("n_match") <=
        math.min(r.getAs[Long]("nf_a"), r.getAs[Long]("nf_b")))
    }
    // the shorter-side vote genuinely runs on unequal frame counts
    assert(out.exists(r =>
      r.getAs[Long]("nf_a") != r.getAs[Long]("nf_b")),
      "fixture produced no unequal-frame-count pair")
    // r=0 re-encodes of the same clip are byte-identical per frame:
    // every shared frame index matches -> score exactly 1.0
    // (r = id/3 % 4 == 0 for ids 0-2 and 12-14; same-group zero-flip
    // pairs are (0,12) (1,13) (2,14))
    val zeroFlip = out.filter(r => r.getAs[Long]("media_id_a") / 3 % 4 == 0
      && r.getAs[Long]("media_id_b") / 3 % 4 == 0)
    assert(zeroFlip.nonEmpty)
    assert(zeroFlip.forall(_.getAs[Double]("score") === 1.0))
    // deterministic
    val again = graft.operators.MediaCodecs
      .mediaVideoDedup(spark, docs.repartition(5), groupMod = 3).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
