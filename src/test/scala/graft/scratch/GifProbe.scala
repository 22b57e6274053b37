package graft.scratch

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

object GifProbe {
  def main(args: Array[String]): Unit = {
    val r = Array.tabulate(256)(i => i.toByte)
    val g = Array.tabulate(256)(i => ((i * 3) % 256).toByte)
    val bl = Array.tabulate(256)(i => ((i * 7) % 256).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, r, g, bl)
    val img = new java.awt.image.BufferedImage(11, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    (0 until 7).foreach(y => (0 until 11).foreach { x =>
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 11) % 256)
    })
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", bos)
    val b = bos.toByteArray
    println("len=" + b.length)
    println("header=" + new String(b.take(6)))
    val packed = b(10) & 0xff
    println(f"packed=$packed%02x gct=${(packed & 0x80) != 0} size=${2 << (packed & 7)}")
    var pos = 13
    if ((packed & 0x80) != 0) pos += 3 * (2 << (packed & 7))
    var done = false
    while (!done && pos < b.length) {
      val t = b(pos) & 0xff
      println(f"block at $pos: $t%02x")
      t match {
        case 0x21 =>
          println(f"  ext label=${b(pos + 1) & 0xff}%02x")
          pos += 2
          while ((b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val w = (b(pos + 5) & 0xff) | ((b(pos + 6) & 0xff) << 8)
          val h = (b(pos + 7) & 0xff) | ((b(pos + 8) & 0xff) << 8)
          val ip = b(pos + 9) & 0xff
          println(f"  img w=$w h=$h ip=$ip%02x interlace=${(ip & 0x40) != 0} lct=${(ip & 0x80) != 0}")
          pos += 10
          if ((ip & 0x80) != 0) pos += 3 * (2 << (ip & 7))
          println("  minCode=" + (b(pos) & 0xff))
          pos += 1
          var datalen = 0
          while ((b(pos) & 0xff) != 0) { datalen += b(pos) & 0xff; pos += 1 + (b(pos) & 0xff) }
          pos += 1
          println("  data=" + datalen)
        case 0x3b => done = true; println("  trailer")
        case _ => done = true; println("  UNKNOWN")
      }
    }
    println("decode=" + graft.operators.MediaCodecs.decodeGifGray(b).map(t => (t._1, t._2)))
  }
}
