package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Parity between the hand-rolled PNG codec ([[Multimodal.pngDecode]] /
  * [[Multimodal.grayPng]] — the image hot path; ImageIO's per-payload
  * BufferedImage round-trip was the m16 10×-stress bottleneck) and the
  * JDK codec it displaces: both decoders must read each other's output
  * to identical pixels, and the hand encoder must emit standard PNGs
  * with the exact `IHDR,IDAT,IEND` sequence the audit oracles pin. */
class PngCodecParitySpec extends AnyFunSuite {

  /** ImageIO reference decode to (w, h, argb rows). */
  private def imageioArgb(png: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = img.getRGB(x, y); x += 1 }
        y += 1
      }
      Some((w, h, px))
    }
  }

  /** An ImageIO-encoded RGB PNG with arbitrary per-pixel colors — the
    * shape the JDK writer emits with its own filter heuristics, which
    * the hand de-filter must reverse exactly. */
  private def imageioRgbPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("hand decode of JDK-encoded RGB PNGs is pixel-exact (all filter " +
    "shapes the JDK writer emits)") {
    // several content classes to exercise different adaptive filters:
    // noise (None/Sub), gradients (Sub/Up/Average/Paeth), flats (Up)
    val shapes = Seq[(Int, Int, (Int, Int) => Int)](
      (16, 16, (x, y) => { // deterministic noise
        val v = (x * 2654435761L + y * 40503L + 7) & 0xffffff; v.toInt }),
      (33, 9, (x, y) => ((x * 7 + y * 3) % 256) * 0x010101),
      (8, 64, (_, _) => 0x336699),
      (64, 8, (x, y) => ((x << 16) | (y << 8) | ((x + y) & 0xff))),
      (1, 1, (_, _) => 0xABCDEF),
      (255, 3, (x, y) => ((x ^ y) & 0xff) * 0x010101))
    for ((w, h, f) <- shapes) {
      val png = imageioRgbPng(w, h, f)
      val hand = Multimodal.pngDecode(png)
        .getOrElse(fail(s"hand decode declined a JDK RGB PNG ${w}x$h"))
      assert(hand.width == w && hand.height == h && hand.channels == 3)
      val Some((_, _, ref)) = imageioArgb(png)
      var i = 0
      while (i < w * h) {
        val p = ref(i)
        val o = i * 3
        assert((hand.data(o) & 0xff) == ((p >> 16) & 0xff) &&
          (hand.data(o + 1) & 0xff) == ((p >> 8) & 0xff) &&
          (hand.data(o + 2) & 0xff) == (p & 0xff),
          s"pixel $i differs: hand vs ImageIO on ${w}x$h")
        i += 1
      }
    }
  }

  test("JDK decode of hand-encoded gray PNGs returns the raw gray " +
    "levels (ImageIO reads our files; the bytes are standard PNG)") {
    val w = 24; val h = 16
    val gray = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val png = Multimodal.grayPng(w, h, gray)
    // ImageIO must ACCEPT the file (proof the container + zlib stream
    // are standard), and its raster must carry the raw samples
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO rejected the hand-encoded PNG")
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (gray(y * w + x) & 0xff),
        s"raw gray sample differs at ($x,$y)")
    // and OUR decoder round-trips bit-exactly
    val back = Multimodal.pngGray(png).get
    assert(back._1 == w && back._2 == h && back._3.toSeq == gray.toSeq)
  }

  test("hand-encoded PNG has the exact IHDR,IDAT,IEND sequence with " +
    "valid CRCs (the container-audit oracle contract)") {
    val png = Multimodal.gradientPng(18, 8, 42L)
    val chunks = Multimodal.pngChunks(png)
    assert(chunks.map(_._2) == Seq("IHDR", "IDAT", "IEND"))
    assert(chunks.forall(_._4), "all CRCs must verify")
  }

  test("gradientPng pixel values are unchanged from the ImageIO-RGB " +
    "spelling (gray = (seed + 3x + 7y) mod 256)") {
    for ((w, h, seed) <- Seq((18, 8, 5L), (9, 8, 901L), (24, 16, 70L))) {
      val Some((dw, dh, g)) = Multimodal.pngGray(Multimodal.gradientPng(w, h, seed))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((g(y * w + x) & 0xff) == ((seed + 3 * x + 7 * y) % 256).toInt,
          s"gray differs at ($x,$y) seed=$seed")
    }
  }

  test("tileHashes and dHash64 are identical through hand and ImageIO " +
    "paths (same gray reduction)") {
    for (seed <- 0L until 8L) {
      val w = 72; val h = 16 // divisible by 9 and 8, and by tile 8
      // ImageIO RGB spelling of the same gradient (r=g=b)
      val rgbPng = imageioRgbPng(w, h,
        (x, y) => (((seed + 3 * x + 7 * y) % 256).toInt) * 0x010101)
      val grayPng = Multimodal.gradientPng(w, h, seed)
      assert(Multimodal.tileHashes(rgbPng).get == Multimodal.tileHashes(grayPng).get,
        s"tile hashes differ between codecs at seed=$seed")
      assert(Multimodal.dHash64(rgbPng).get == Multimodal.dHash64(grayPng).get,
        s"dHash differs between codecs at seed=$seed")
    }
  }

  test("decodePixelStats parity on JDK-encoded RGB payloads") {
    val png = imageioRgbPng(16, 16,
      (x, y) => ((x * 13) << 16) | ((y * 9) << 8) | ((x + y) & 0xff))
    // hand path (pngDecode accepts) vs a forced-ImageIO reference
    val hand = Multimodal.decodePixelStats(png).get
    val Some((w, h, ref)) = imageioArgb(png)
    var r = 0L; var g = 0L; var b = 0L
    ref.foreach { p => r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff }
    val n = (w * h).toDouble
    assert(hand.meanR == r / n && hand.meanG == g / n && hand.meanB == b / n)
  }

  test("declines → ImageIO fallback: palette and 16-bit PNGs still decode") {
    // 16-bit gray PNG via ImageIO (TYPE_USHORT_GRAY)
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, (x + y) * 4000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png16 = bos.toByteArray
    assert(Multimodal.pngDecode(png16).isEmpty,
      "hand path must DECLINE 16-bit, not misread it")
    assert(Multimodal.decodePixelStats(png16).isDefined,
      "ImageIO fallback must still decode what the hand path declines")
    // garbage and truncations refuse cleanly
    assert(Multimodal.pngDecode("not a png".getBytes).isEmpty)
    val trunc = Multimodal.gradientPng(18, 8, 1L).take(30)
    assert(Multimodal.pngDecode(trunc).isEmpty)
  }

  test("gray parity across decode paths: 16-bit gray falls back to " +
    "ImageIO yet reports RAW gray samples (no gray→sRGB conversion), " +
    "matching the hand path on equivalent 8-bit content (r19 ADVICE)") {
    val w = 18; val h = 8 // dHash64's exact-path dims (w%9==0, h%8==0)
    def v(x: Int, y: Int): Int = (x * 31 + y * 7) % 256
    def grayPng(bits: Int): Array[Byte] = {
      val t = if (bits == 8) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_USHORT_GRAY
      val img = new java.awt.image.BufferedImage(w, h, t)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          if (bits == 8) v(x, y) else v(x, y) * 257) // v*257 = v<<8|v
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val png8 = grayPng(8); val png16 = grayPng(16)
    assert(Multimodal.pngDecode(png8).isDefined, "8-bit gray is hand-path")
    assert(Multimodal.pngDecode(png16).isEmpty, "16-bit gray must fall back")
    val a = Multimodal.decodePixelStats(png8).get
    val b = Multimodal.decodePixelStats(png16).get
    // high byte of v*257 is exactly v → the two paths must agree exactly
    assert(a.meanR == b.meanR && a.meanG == b.meanG && a.meanB == b.meanB,
      s"gray decode paths diverge: hand=$a imageio=$b")
    assert(Multimodal.dHash64(png8) == Multimodal.dHash64(png16),
      "dHash64 must be identical for equivalent gray content on both paths")
  }

  test("PNG round-trip work THREAD-SCALES (Deflater/Inflater are " +
    "per-instance native streams — the WavCodecParitySpec contract)") {
    def work(n: Int, seedBase: Long): Unit = {
      var i = 0
      while (i < n) {
        val png = Multimodal.gradientPng(24, 16, seedBase + i % 64)
        assert(Multimodal.tileHashes(png).get.nonEmpty)
        i += 1
      }
    }
    work(3000, 0) // warm
    val rows = 24000
    val t1 = { val t0 = System.nanoTime(); work(rows, 1)
      (System.nanoTime() - t0) / 1e6 }
    val t8 = {
      val t0 = System.nanoTime()
      val th = (0 until 8).map { t =>
        new Thread(new Runnable {
          def run(): Unit = work(rows / 8, t * 1000L) }) }
      th.foreach(_.start()); th.foreach(_.join())
      (System.nanoTime() - t0) / 1e6
    }
    // ratio assertion is load-sensitive: only on an idle >=8-core host
    // (or GRAFT_TIMING_ASSERTS=1); the functional work above always ran
    if (graft.TimingAsserts.enabled())
      assert(t8 * 2 < t1,
        f"PNG codec does not thread-scale: 1-thread $t1%.0f ms vs 8-thread $t8%.0f ms")
    else info(f"timing assertion skipped (busy/low-core host): " +
      f"1-thread $t1%.0f ms vs 8-thread $t8%.0f ms")
  }
}
