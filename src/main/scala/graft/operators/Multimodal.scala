package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Payloads are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB multimodal corpus uses (bytes in parquet/lance-like
  * files, decode deferred to the last possible stage). Decode / feature
  * extraction runs batched per partition via `Dataset.mapPartitions` (the
  * JVM analogue of `mapInPandas`: one iterator per partition, constant
  * memory, no driver involvement).
  *
  * Codec coverage, honestly labeled:
  *  - REAL pixel decode: hand-rolled non-interlaced 8-bit PNG codec
  *    ([[pngDecode]]/[[grayPng]] over JDK Inflater/Deflater — the hot
  *    path; ImageIO's per-payload BufferedImage round-trip was the m16
  *    10×-stress bottleneck) with ImageIO as the fallback for
  *    JPEG/GIF/BMP/16-bit/palette/interlaced and the parity cross-check
  *    in `PngCodecParitySpec`; REAL 16-bit-PCM sample decode via the
  *    hand-rolled RIFF/WAVE parser [[wavPcm]] (javax.sound's reader
  *    stack holds JVM-global locks — zero thread-scaling measured — so
  *    the hot path owns the trivial format and the JDK codec remains as
  *    the parity cross-check in `WavCodecParitySpec`) — no external
  *    libraries;
  *  - REAL container-header parsing (PNG/JPEG/GIF/BMP/WAV/ISO-BMFF)
  *    in pure JDK byte walks below;
  *  - formats the JDK has no codec for (video frame pixels, non-PCM
  *    audio) fall back to the deterministic [[decodeStub]], which fakes
  *    values from the bytes so the plumbing stays testable end-to-end.
  */
object Multimodal {

  // ImageIO defaults to FILE-backed stream caches: every encode/decode
  // creates and deletes a temp file — per-row syscall + filesystem
  // contention for zero benefit on small in-memory payloads. Memory
  // caching is set once per JVM (each executor initializes on first use).
  javax.imageio.ImageIO.setUseCache(false)

  /** Input record: id + raw payload + declared modality. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], modality: String)

  /** Decoded metadata + a small feature vector. */
  final case class DecodedRecord(doc_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int,
      features: Array[Float])

  /** STUB: "decode" an image/audio/video payload. Deterministic over bytes:
    * dimensions from simple byte arithmetic, features from a rolling hash.
    * A real deployment would call an actual codec here (and nothing else
    * in this file would change). */
  def decodeStub(payload: Array[Byte], modality: String): (Int, Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val h = graft.functions.GraftHash.fnv1a64(payload)
    val width = 16 + (n % 624)                      // STUB: fake dimensions
    val height = 16 + (n % 464)
    val channels = if (modality == "audio") 1 else 3
    val nFrames = if (modality == "video") 1 + (n % 29) else 1
    val features = Array.tabulate(8) { i =>         // STUB: fake features
      (((h >>> (i * 8)) & 0xff).toFloat / 255.0f) * 2.0f - 1.0f
    }
    (width, height, channels, nFrames, features)
  }

  // ------------------------------------------------- real header parsing
  // JDK-only container-header parsers. These read REAL metadata (the part
  // of "decoding" that needs no codec library); only pixel/sample decoding
  // remains stubbed. Each returns None on any structural mismatch so
  // unrecognized bytes fall back to the stub.

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSignature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG IHDR: (width, height, channels). The IHDR chunk is required to be
    * first (PNG spec §11.2.2), at byte 16 after the 8-byte signature and
    * 8-byte chunk header; channels derive from the color type. */
  def parsePngHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 26) return None
    if (!b.startsWith(PngSignature)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    val channels = b(25) match { // color type
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette
      case 4 => 2 // gray+alpha
      case 6 => 4 // truecolor+alpha
      case _ => return None
    }
    Some((w, h, channels))
  }

  /** JPEG SOF0/SOF2: walk marker segments from SOI to the first
    * start-of-frame; (width, height, components). */
  def parseJpegHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None // SOI
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else if (marker == 0xda || marker == 0xd9) {
        return None // entropy-coded data / EOI before any SOF
      } else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        // SOF0 (baseline) or SOF2 (progressive): precision(1) height(2)
        // width(2) ncomponents(1)
        if (marker == 0xc0 || marker == 0xc2) {
          if (len < 8) return None
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          val comps = b(i + 9) & 0xff
          if (w <= 0 || h <= 0 || comps <= 0) return None
          return Some((w, h, comps))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/89a logical screen descriptor: (width, height, 3). */
  def parseGifHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 10) return None
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some((w, h, 3))
  }

  /** BMP BITMAPINFOHEADER (and later V4/V5 variants — all share the first
    * 16 bytes): (width, |height|, channels = bitcount/8 floored to ≥ 1).
    * Height may be negative (top-down rows). */
  def parseBmpHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 30) return None
    if (!(b(0) == 'B' && b(1) == 'M')) return None
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not handled
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    val bits = le16(b, 28)
    if (w <= 0 || h == 0 || bits <= 0) return None
    Some((w, h, math.max(1, bits / 8)))
  }

  // ---------------------------------------------------------- ISO-BMFF
  /** Container boxes the walker descends into (size(4 BE) type(4cc) child
    * boxes...). 64-bit (`size==1`) and to-EOF (`size==0`) boxes abort the
    * walk — fall back to the stub rather than misparse. */
  private val Mp4Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** First box of `target` within [from, to): payload range (start, end). */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      target: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(b, i)
      if (size < 8 || i + size > to) return None
      val typ = new String(b, i + 4, 4, "ISO-8859-1")
      if (typ == target) return Some((i + 8, i + size))
      if (Mp4Containers(typ)) {
        val r = findBox(b, i + 8, i + size, target)
        if (r.isDefined) return r
      }
      i += size
    }
    None
  }

  /** MP4/ISO-BMFF `mvhd`: presentation duration in SECONDS
    * (duration ticks / timescale), version 0 and 1 layouts. */
  def parseMp4Duration(b: Array[Byte]): Option[Double] = {
    if (b.length < 12) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    findBox(b, 0, b.length, "mvhd").flatMap { case (ps, pe) =>
      val v = b(ps) & 0xff
      // v0: vf(4) ctime(4) mtime(4) timescale(4) duration(4)
      // v1: vf(4) ctime(8) mtime(8) timescale(4) duration(8)
      if (v == 0 && ps + 20 <= pe) {
        val ts = be32(b, ps + 12); val dur = be32(b, ps + 16) & 0xffffffffL
        if (ts > 0) Some(dur.toDouble / ts) else None
      } else if (v == 1 && ps + 32 <= pe) {
        val ts = be32(b, ps + 20)
        val dur = ((be32(b, ps + 24) & 0xffffffffL) << 32) |
          (be32(b, ps + 28) & 0xffffffffL)
        if (ts > 0) Some(dur.toDouble / ts) else None
      } else None
    }
  }

  /** MP4/ISO-BMFF video metadata: (width, height, n_frames). Dimensions
    * from the first `tkhd` (16.16 fixed point — zero for pure-audio tracks,
    * which therefore return None); the REAL frame count is the `stts`
    * (time-to-sample) sample-count total — the ground truth a real frame
    * sampler would walk, not a duration×fps estimate. */
  def parseMp4Header(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    for {
      (ts, te) <- findBox(b, 0, b.length, "tkhd")
      (ss, se) <- findBox(b, 0, b.length, "stts")
      wOff = if ((b(ts) & 0xff) == 1) ts + 88 else ts + 76
      if wOff + 8 <= te && ss + 8 <= se
      w = be32(b, wOff) >>> 16
      h = be32(b, wOff + 4) >>> 16
      if w > 0 && h > 0
      n = sttsSampleTotal(b, ss, se)
      if n > 0
    } yield (w, h, n)
  }

  private def sttsSampleTotal(b: Array[Byte], ps: Int, pe: Int): Int = {
    val entries = be32(b, ps + 4)
    var i = 0; var off = ps + 8; var total = 0L
    while (i < entries && off + 8 <= pe) {
      total += be32(b, off) & 0xffffffffL // (sample_count, sample_delta)
      off += 8; i += 1
    }
    math.min(total, Int.MaxValue.toLong).toInt
  }

  /** MP4 per-sample tables: `stsz` sample sizes (bytes) paired with `stts`
    * decode start times (ticks) — the real metadata a frame sampler walks
    * to seek and slice individual samples, as opposed to the whole-track
    * totals of [[parseMp4Header]]. Returns (sizes, startTicks), same
    * length, or None when either table is absent/malformed/inconsistent.
    * Table lengths are capped at 2²² samples — far above any fixture and
    * a runaway guard against corrupt headers declaring giant counts. */
  def parseMp4SampleTable(b: Array[Byte]): Option[(Array[Long], Array[Long])] = {
    if (b.length < 12) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    for {
      (zs, ze) <- findBox(b, 0, b.length, "stsz")
      (ss, se) <- findBox(b, 0, b.length, "stts")
      sizes <- stszSizes(b, zs, ze)
      starts <- sttsStarts(b, ss, se)
      if sizes.length == starts.length
    } yield (sizes, starts)
  }

  private final val MaxSamples = 1 << 22

  /** `stsz`: vf(4) sample_size(4) sample_count(4) [entries 4·n when
    * sample_size == 0; uniform otherwise]. */
  private def stszSizes(b: Array[Byte], ps: Int, pe: Int): Option[Array[Long]] = {
    if (ps + 12 > pe) return None
    val uniform = be32(b, ps + 4) & 0xffffffffL
    val n = be32(b, ps + 8)
    if (n < 0 || n > MaxSamples) return None
    if (uniform != 0) Some(Array.fill(n)(uniform))
    else if (ps + 12 + 4L * n > pe) None
    else Some(Array.tabulate(n)(i => be32(b, ps + 12 + 4 * i) & 0xffffffffL))
  }

  /** `stts` run expansion: each (sample_count, sample_delta) run yields
    * that many cumulative start ticks. */
  private def sttsStarts(b: Array[Byte], ps: Int, pe: Int): Option[Array[Long]] = {
    if (ps + 8 > pe) return None
    val entries = be32(b, ps + 4)
    if (entries < 0 || ps + 8 + 8L * entries > pe) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var t = 0L; var e = 0; var off = ps + 8
    while (e < entries) {
      val cnt = be32(b, off) & 0xffffffffL
      val delta = be32(b, off + 4) & 0xffffffffL
      if (out.length + cnt > MaxSamples) return None
      var i = 0L
      while (i < cnt) { out += t; t += delta; i += 1 }
      off += 8; e += 1
    }
    Some(out.toArray)
  }

  /** WAV RIFF `fmt ` chunk: (sampleRate, bitsPerSample, channels). */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    while (i + 8 <= b.length) { // chunk walk: id(4) size(4 LE) payload
      val size = le32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        val channels = le16(b, i + 10)
        val sampleRate = le32(b, i + 12)
        val bits = le16(b, i + 22)
        if (channels <= 0 || sampleRate <= 0 || bits <= 0) return None
        return Some((sampleRate, bits, channels))
      }
      if (size < 0) return None
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** Decode dispatch: sniff the container by magic bytes and parse the REAL
    * header when one is present; anything unrecognized falls back to
    * [[decodeStub]]. Mapping into the uniform record: images (PNG/JPEG/
    * GIF/BMP) report pixel (width, height, channels); WAV audio reports
    * (sampleRate, bitsPerSample, channels) in the (width, height, channels)
    * slots — the natural per-modality "dimensions" — with n_frames 1; MP4
    * video reports tkhd dimensions and the REAL stts frame count. The
    * FEATURE vector stays stubbed here — this path deliberately reads
    * headers only; real pixel/sample decode lives in [[decodePixelStats]]
    * / [[decodeAudioStats]] (JDK ImageIO / javax.sound), and video frame
    * pixels have no JDK codec at all. */
  def decodeMedia(payload: Array[Byte], modality: String): (Int, Int, Int, Int, Array[Float]) = {
    val stub = decodeStub(payload, modality)
    parseMp4Header(payload) match {
      case Some((w, h, n)) => (w, h, 3, n, stub._5)
      case None =>
        parsePngHeader(payload)
          .orElse(parseJpegHeader(payload))
          .orElse(parseGifHeader(payload))
          .orElse(parseBmpHeader(payload))
          .orElse(parseWavHeader(payload)) match {
          case Some((a, b, c)) => (a, b, c, 1, stub._5)
          case None => stub
        }
    }
  }

  // ------------------------------------------------- real pixel decode
  // The JDK ships a real image codec (javax.imageio — PNG/JPEG/GIF/BMP
  // encode AND decode), so pixel access is NOT stubbed: decodePixelStats
  // runs an actual inflate + raster walk. Only formats the JDK lacks
  // (video frames, non-PCM audio) remain behind the stub.

  // AWT must never touch a display on an executor
  System.setProperty("java.awt.headless", "true")

  /** Real per-image pixel statistics. */
  final case class PixelStats(width: Int, height: Int, meanR: Double,
      meanG: Double, meanB: Double, nPixels: Long)

  /** Raw-gray raster reader for an ImageIO-decoded image, or None for
    * non-gray color models. `getRGB` routes gray color models through a
    * gray→sRGB color-space conversion the hand PNG path never applies
    * (it reports raw samples), so an exotic gray PNG (interlaced,
    * 16-bit) that falls back to ImageIO would hash/average differently
    * from the same content on the hand path. Reading the raster sample
    * directly restores parity; 16-bit samples reduce to the high byte
    * (the same 16→8 reduction a PNG 8-bit re-encode performs). */
  private def grayRaster(img: java.awt.image.BufferedImage)
      : Option[(Int, Int) => Int] =
    if (img.getColorModel.getColorSpace.getType !=
        java.awt.color.ColorSpace.TYPE_GRAY) None
    else {
      val bits = img.getColorModel.getComponentSize(0)
      val raster = img.getRaster
      val shift = if (bits > 8) bits - 8 else 0
      Some((x, y) => raster.getSample(x, y, 0) >> shift)
    }

  /** REAL decode via ImageIO (PNG/JPEG/GIF/BMP): mean channel values over
    * every pixel. None when the bytes are not a decodable image — caller
    * falls back to header parsing / the stub. Integer channel sums, one
    * double division — deterministic and engine-mirrorable. */
  def decodePixelStats(payload: Array[Byte]): Option[PixelStats] =
    pngDecode(payload) match {
      case Some(px) => // hand-rolled decode: raw channel samples
        val n = px.width.toLong * px.height
        var r = 0L; var g = 0L; var b = 0L
        val c = px.channels
        var i = 0
        if (c >= 3) { // RGB / RGBA
          while (i < n) {
            val o = (i * c).toInt
            r += px.data(o) & 0xff; g += px.data(o + 1) & 0xff
            b += px.data(o + 2) & 0xff
            i += 1
          }
        } else { // gray / gray+alpha: r=g=b=v (no gamma reinterpretation)
          while (i < n) {
            val v = (px.data((i * c).toInt) & 0xff).toLong
            r += v; g += v; b += v
            i += 1
          }
        }
        Some(PixelStats(px.width, px.height, r.toDouble / n,
          g.toDouble / n, b.toDouble / n, n))
      case None => // ImageIO fallback (JPEG/GIF/BMP, exotic PNGs)
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            var r = 0L; var g = 0L; var b = 0L
            val gray = grayRaster(img)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                gray match {
                  case Some(gv) =>
                    val v = gv(x, y).toLong; r += v; g += v; b += v
                  case None =>
                    val p = img.getRGB(x, y)
                    r += (p >> 16) & 0xff; g += (p >> 8) & 0xff
                    b += p & 0xff
                }
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Some(PixelStats(w, h, r.toDouble / n, g.toDouble / n,
              b.toDouble / n, n))
          }
        } catch { case _: Exception => None }
    }

  /** Encode a solid-color RGB PNG (fixture/test helper — a REAL zlib-
    * compressed PNG via ImageIO, decodable by any viewer). */
  def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image resize: decode via ImageIO, aspect-preserving fit
    * ([[fitDims]]), nearest-neighbor raster resample (pure integer source
    * indexing `sx = x·w/ow` — deterministic across JVMs, unlike
    * area-averaging filters), re-encode as PNG. None when the payload is
    * not a decodable image. */
  def resizeImagePayload(payload: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val (ow, oh) = fitDims(w, h, targetW, targetH)
        val out = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < oh) {
          val sy = (y.toLong * h / oh).toInt
          var x = 0
          while (x < ow) {
            out.setRGB(x, y, img.getRGB((x.toLong * w / ow).toInt, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------- hand-rolled PNG
  // The WAV-codec policy applied to the image hot path: ImageIO's PNG
  // round-trip is correct but costly per small payload (BufferedImage
  // allocation, color-model dispatch, per-pixel getRGB virtual calls),
  // and the r17 10× stress showed the tile-crop gate (m16) running 8.6×
  // for 10× data on exactly that per-tile encode/decode. PNG's
  // non-interlaced 8-bit core is ~200 lines over JDK Deflater/Inflater
  // (both per-instance native streams — no global locks, thread-scales),
  // so the hot path owns it; ImageIO remains the fallback for every
  // shape the hand path declines (JPEG/GIF/BMP, 16-bit, palette,
  // interlaced) and the parity cross-check in `PngCodecParitySpec`.

  /** De-filtered 8-bit raster: `data` is row-major samples, `channels`
    * interleaved per pixel (1=gray, 2=gray+alpha, 3=RGB, 4=RGBA). */
  private[operators] final case class PngRaster(width: Int, height: Int,
      channels: Int, data: Array[Byte])

  /** Hand-rolled decode of a non-interlaced 8-bit-depth PNG (color
    * types 0/2/4/6 — gray, RGB, gray+alpha, RGBA): walk the chunk list,
    * concatenate IDAT payloads, inflate, reverse the per-row filter
    * (None/Sub/Up/Average/Paeth). None for anything else — palette,
    * 16-bit, interlaced, or non-PNG payloads fall back to ImageIO at
    * the call sites. CRCs are NOT verified here (the audit gates verify
    * them explicitly via [[pngChunks]]); a structurally broken stream
    * surfaces as None through the bounds checks or the Inflater. */
  private[operators] def pngDecode(b: Array[Byte]): Option[PngRaster] = {
    if (b.length < 8 + 25 || !b.startsWith(PngSignature)) return None
    try {
      var w = 0; var h = 0; var colorType = -1; var bitDepth = 0
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8
      var sawEnd = false
      while (!sawEnd && i + 8 <= b.length) {
        val len = be32(b, i)
        if (len < 0 || i + 12 + len > b.length) return None
        val t = new String(b, i + 4, 4, "US-ASCII")
        t match {
          case "IHDR" =>
            if (len < 13) return None
            w = be32(b, i + 8); h = be32(b, i + 12)
            bitDepth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
            // compression 0, filter 0, interlace 0 only
            if (b(i + 18) != 0 || b(i + 19) != 0 || b(i + 20) != 0)
              return None
          case "IDAT" => idat.write(b, i + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunks don't affect the raster
        }
        i += 12 + len
      }
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
        case _ => return None
      }
      if (bitDepth != 8 || w <= 0 || h <= 0 || idat.size() == 0) return None
      val bpr = w * channels // bytes per row (filtered rows carry +1)
      val raw = new Array[Byte]((bpr + 1) * h)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && inf.needsInput()) return None // truncated stream
          off += n
        }
        if (off < raw.length) return None
      } finally inf.end()
      // reverse the per-row filter in place into the output raster
      val out = new Array[Byte](bpr * h)
      val bpp = channels
      var y = 0
      while (y < h) {
        val ft = raw(y * (bpr + 1)) & 0xff
        val src = y * (bpr + 1) + 1
        val dst = y * bpr
        val prev = dst - bpr // previous row start (y > 0)
        var x = 0
        ft match {
          case 0 => System.arraycopy(raw, src, out, dst, bpr)
          case 1 => // Sub: left neighbor
            while (x < bpr) {
              val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
              out(dst + x) = ((raw(src + x) & 0xff) + a).toByte
              x += 1
            }
          case 2 => // Up
            while (x < bpr) {
              val u = if (y > 0) out(prev + x) & 0xff else 0
              out(dst + x) = ((raw(src + x) & 0xff) + u).toByte
              x += 1
            }
          case 3 => // Average
            while (x < bpr) {
              val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
              val u = if (y > 0) out(prev + x) & 0xff else 0
              out(dst + x) = ((raw(src + x) & 0xff) + (a + u) / 2).toByte
              x += 1
            }
          case 4 => // Paeth
            while (x < bpr) {
              val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
              val u = if (y > 0) out(prev + x) & 0xff else 0
              val c = if (y > 0 && x >= bpp) out(prev + x - bpp) & 0xff else 0
              val p = a + u - c
              val pa = math.abs(p - a); val pb = math.abs(p - u)
              val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a
                else if (pb <= pc) u else c
              out(dst + x) = ((raw(src + x) & 0xff) + pred).toByte
              x += 1
            }
          case _ => return None
        }
        y += 1
      }
      Some(PngRaster(w, h, channels, out))
    } catch { case _: Exception => None }
  }

  /** Gray view of a hand-decoded PNG: integer (r+g+b)/3 for color
    * (alpha ignored — the same reduction every gray consumer here uses),
    * raw samples for gray. None when [[pngDecode]] declines. */
  private[operators] def pngGray(b: Array[Byte])
      : Option[(Int, Int, Array[Byte])] =
    pngDecode(b).map { r =>
      r.channels match {
        case 1 => (r.width, r.height, r.data)
        case _ =>
          val n = r.width * r.height
          val g = new Array[Byte](n)
          val c = r.channels
          var i = 0
          while (i < n) {
            val o = i * c
            g(i) = (((r.data(o) & 0xff) + (r.data(o + 1) & 0xff) +
              (r.data(o + 2) & 0xff)) / 3).toByte
            i += 1
          }
          (r.width, r.height, g)
      }
    }

  /** Hand-rolled 8-bit GRAYSCALE PNG encode: IHDR + ONE IDAT (filter 0
    * rows, JDK Deflater at BEST_SPEED — per-instance native stream, so
    * encode thread-scales) + IEND, real CRC32s — a standard, any-viewer-
    * decodable PNG with exactly the `IHDR,IDAT,IEND` sequence the
    * container-audit oracles pin. `gray` is row-major, length w·h. */
  def grayPng(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"gray raster must be ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream(64 + gray.length / 2)
    bos.write(PngSignature, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write(len >>> 24); bos.write(len >>> 16)
      bos.write(len >>> 8); bos.write(len)
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb, 0, 4)
      bos.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue.toInt
      bos.write(c >>> 24); bos.write(c >>> 16); bos.write(c >>> 8)
      bos.write(c)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte) // bit depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter0, no interlace
    chunk("IHDR", ihdr.array())
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      // raw(y*(w+1)) is already 0 = filter None
      System.arraycopy(gray, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val def_ = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    val idat = try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream(raw.length / 2)
      while (!def_.finished()) {
        val n = def_.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally def_.end()
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  // ------------------------------------------------- real sample decode
  // The JDK also ships a real audio codec (javax.sound.sampled — PCM WAV
  // read/write), so sample access is not stubbed either.

  /** The JDK's audio file readers, loaded ONCE via the public SPI —
    * TEST-SUPPORT ONLY (the parity spec cross-validates the hand-rolled
    * decode below against the JDK codec). Not on any hot path: the
    * javax.sound reader stack takes JVM-GLOBAL locks (the registry walk
    * in `AudioSystem.getAudioInputStream`, and MidiSystem's synchronized
    * provider lookup inside the SoftMidi reader's probe), measured at
    * the r17 10× stress as ZERO thread-scaling — a 16.7k-row decode ran
    * in identical wall time at `local[4]` and `local[32]`, and a plain
    * 8-thread JVM microbench of decode-only work ran SLOWER than one
    * thread. */
  private[operators] lazy val audioReaders
      : List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** JDK-codec decode for the parity spec: probe the cached providers in
    * registry order; null when none accepts the payload. */
  private[operators] def audioInputStream(payload: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    var rs = audioReaders
    while (rs.nonEmpty) {
      try return rs.head.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
      rs = rs.tail
    }
    null
  }

  /** HAND-ROLLED RIFF/WAVE integer-PCM extraction — the hot-path decode
    * (the same policy as the hand-rolled xlsx ZIP+StAX codec: the JDK
    * parser exists but its lock discipline or shape is wrong for a
    * 32-thread scan, and the format is simple enough to own). Walks the
    * word-aligned chunk list, requires a format-tag-1 (integer PCM)
    * `fmt ` chunk, and returns (sampleRate, bitsPerSample, channels,
    * raw `data` payload). None for anything else — a compressed or
    * float stream must never be reinterpreted as integer samples.
    * Bit-for-bit parity with javax.sound is pinned in
    * `WavCodecParitySpec`. */
  private[operators] def wavPcm(b: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Array[Byte]] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(b, i + 4)
      if (size < 0) return None
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
        b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a'
      if (isData) {
        // A data chunk whose declared size overruns the buffer is COMMON
        // from streaming writers that patch sizes late (or never):
        // truncate to the bytes actually present — rejecting here would
        // silently demote real-world WAVs to the header/stub path
        // (observed r17 regression vs the JDK codec, which also reads
        // what is there).
        val end = math.min(b.length.toLong, i + 8L + size).toInt
        data = Some(java.util.Arrays.copyOfRange(b, i + 8, end))
      } else if (i.toLong + 8L + size > b.length) {
        // Long math: a declared size near 2^31 would wrap an Int sum
        // negative and sail past this check, then index b(negative).
        return None // any OTHER truncated chunk: structure is broken
      } else if (isFmt) {
        if (size < 16) return None
        val tag = le16(b, i + 8)
        val channels = le16(b, i + 10)
        val rate = le32(b, i + 12)
        val bits = le16(b, i + 22)
        // tag 1 = integer PCM; tag 0xFFFE = WAVE_FORMAT_EXTENSIBLE,
        // integer PCM iff the 16-byte subformat GUID (at data offset 24,
        // after cbSize/validBits/channelMask) is KSDATAFORMAT_SUBTYPE_PCM
        // {00000001-0000-0010-8000-00AA00389B71} — multichannel and
        // >16-bit writers emit this tag for plain PCM payloads.
        val isPcm = tag == 1 || (tag == 0xFFFE && size >= 40 && {
          val g = i + 8 + 24
          val guid = Array[Int](0x01, 0x00, 0x00, 0x00, 0x00, 0x00,
            0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)
          (0 until 16).forall(j => (b(g + j) & 0xff) == guid(j))
        })
        if (!isPcm || channels <= 0 || rate <= 0 || bits <= 0) return None
        fmt = Some((rate, bits, channels))
      }
      // Advance in Long: a truncated-but-accepted data chunk (size
      // patched late, larger than the bytes present) would wrap an Int
      // sum negative and make the next iteration read b(negative).
      // Nothing can follow a chunk that overruns the buffer, so clamp
      // to b.length and let the loop condition end the walk.
      val next = i.toLong + 8L + size + (size & 1)
      i = if (next > b.length) b.length else next.toInt
    }
    // Frame-align a truncated payload: an AudioInputStream only ever
    // yields whole frames (blockAlign = channels·bytesPerSample), so a
    // late-patched size whose available bytes end mid-frame must drop
    // the partial frame to stay bit-identical with the JDK codec
    // (pinned generatively in WavCodecProps).
    for (f <- fmt; d <- data) yield {
      val frame = f._3 * (f._2 / 8) max 1
      val aligned =
        if (d.length % frame == 0) d
        else java.util.Arrays.copyOf(d, d.length - d.length % frame)
      (f._1, f._2, f._3, aligned)
    }
  }

  /** Real per-clip sample statistics (16-bit PCM). */
  final case class AudioStats(sampleRate: Int, bits: Int, channels: Int,
      nSamples: Long, meanAmp: Double, maxAbs: Long)

  /** REAL decode via javax.sound (PCM WAV): stream the sample frames and
    * compute amplitude statistics. None for anything that is not 16-bit
    * PCM — caller falls back to header parsing / the stub. */
  def decodeAudioStats(payload: Array[Byte]): Option[AudioStats] =
    wavPcm(payload) match {
      case Some((rate, 16, channels, bytes)) =>
        val n = bytes.length / 2
        var sum = 0L; var maxAbs = 0L; var i = 0
        while (i + 1 < bytes.length) {
          val s = (((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort).toLong
          sum += s
          val a = math.abs(s); if (a > maxAbs) maxAbs = a
          i += 2
        }
        Some(AudioStats(rate, 16, channels,
          n.toLong, if (n > 0) sum.toDouble / n else 0.0, maxAbs))
      case _ => None
    }

  /** REAL sample decode: the raw 16-bit PCM sample array out of a WAV
    * payload via javax.sound frame streaming — the input every sample-
    * level audio operator (segmentation, resampling, feature windows)
    * starts from. Signed mono little-endian 16-bit PCM only; None
    * otherwise (an unsigned or companded stream must not be
    * reinterpreted as signed samples). */
  def decodeAudioSamples(payload: Array[Byte]): Option[Array[Short]] =
    wavPcm(payload) match {
      case Some((_, 16, 1, bytes)) =>
        val out = new Array[Short](bytes.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some(out)
      case _ => None
    }

  /** Encode mono 16-bit PCM samples as a canonical WAV (fixture/test
    * helper — a REAL, playable WAV file). */
  def pcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Batched per-partition decode — the `mapInPandas` analogue. */
  def decodeBatch(records: Iterator[MediaRecord]): Iterator[DecodedRecord] =
    records.map { r =>
      // null payload decodes as empty bytes: metadata keeps the stub's
      // floors (width>=16 etc), mirrored by COALESCE in the m01 oracle
      val payload = if (r.payload == null) Array.empty[Byte] else r.payload
      val (w, h, c, f, feat) = decodeMedia(payload, r.modality)
      DecodedRecord(r.doc_id, r.modality, payload.length.toLong, w, h, c, f, feat)
    }

  /** Attach decoded metadata to a DataFrame bearing (idCol, binaryCol,
    * modalityCol). Pure narrow transformation — no shuffle. */
  def withDecodedMeta(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String): Dataset[DecodedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(binCol).as("payload"), col(modalityCol).as("modality"))
      .as[MediaRecord]
      .mapPartitions(decodeBatch _)
  }

  /** One sampled frame reference. `frame_bytes` / `t_ticks` are the real
    * per-sample size and decode start time from the container's stsz/stts
    * tables; None for payloads without sample tables (stub fallback). */
  final case class FrameRef(doc_id: Long, frame_idx: Int, n_frames: Int,
      frame_bytes: Option[Long], t_ticks: Option[Long])

  /** Frame sampling for video payloads: every `stride`-th frame index —
    * flatMap shape (one row in, ceil(n_frames/stride) rows out), batched
    * per partition, no shuffle. For MP4 payloads the frame count is the
    * real `stts` total and each emitted frame carries its `stsz` byte size
    * and `stts` start tick ([[parseMp4SampleTable]]) — everything a seek-
    * and-slice sampler needs short of the pixel decode itself (no JDK
    * video codec; see [[decodeStub]]). Headerless payloads fall back to
    * the stub's deterministic count with null sample metadata. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String, stride: Int): Dataset[FrameRef] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(binCol).as("payload"), col(modalityCol).as("modality"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        if (r.modality != "video") Iterator.empty
        else {
          val payload = if (r.payload == null) Array.empty[Byte] else r.payload
          val (_, _, _, nFrames, _) = decodeMedia(payload, r.modality)
          val table = parseMp4SampleTable(payload)
          (0 until nFrames by stride).iterator.map { i =>
            FrameRef(r.doc_id, i, nFrames,
              table.collect { case (sz, _) if i < sz.length => sz(i) },
              table.collect { case (_, ts) if i < ts.length => ts(i) })
          }
        }
      })
  }

  /** Aspect-preserving fit of (w, h) into (targetW, targetH) in pure
    * integer arithmetic (truncating division — exactly mirrorable in SQL):
    * the side that binds scales to the target, the other scales
    * proportionally. Never upscales. */
  def fitDims(w: Int, h: Int, targetW: Int, targetH: Int): (Int, Int) = {
    if (w <= targetW && h <= targetH) (w, h)
    else if (w.toLong * targetH <= h.toLong * targetW)
      (math.max(1, (w.toLong * targetH / h).toInt), targetH)
    else (targetW, math.max(1, (h.toLong * targetW / w).toInt))
  }

  final case class ResizedRecord(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int)

  /** Resize-to-fit for image payloads — metadata transform driven by the
    * PARSED container dimensions (real header walk via [[decodeMedia]];
    * stub arithmetic only for headerless payloads). This variant computes
    * target dimensions without touching pixels; [[resizeImagePayload]] is
    * the full decode → raster resize → re-encode path (m06). */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String, targetW: Int, targetH: Int): Dataset[ResizedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(binCol).as("payload"), col(modalityCol).as("modality"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        if (r.modality != "image") Iterator.empty
        else {
          val payload = if (r.payload == null) Array.empty[Byte] else r.payload
          val (w, h, _, _, _) = decodeMedia(payload, r.modality)
          val (ow, oh) = fitDims(w, h, targetW, targetH)
          Iterator.single(ResizedRecord(r.doc_id, w, h, ow, oh))
        }
      })
  }

  /** Deterministic fake corpus with REAL container headers: image rows get
    * a genuine PNG signature + IHDR (width 16 + doc_id % 624, height
    * 16 + doc_id % 464, truecolor), audio rows a genuine RIFF/WAVE `fmt `
    * chunk (sample rate 8000·(1 + doc_id % 5), 16-bit,
    * 1 + doc_id % 2 channels), and HALF the video rows (doc_id % 6 == 2) a
    * genuine minimal MP4 of 300 + 4·n_frames bytes (ftyp + moov with mvhd
    * @600 ticks/s, tkhd carrying 16.16 dimensions, an stts whose sample
    * total is the REAL frame count n_frames = 1 + doc_id % 29 at 30 fps,
    * and an stsz whose per-sample sizes are 64 + (doc_id + i) % 191) —
    * each followed by the document's text bytes as fake pixel/sample data.
    * The other video rows (doc_id % 6 == 5) stay raw text bytes so the
    * stub fallback path is exercised too. [[decodeMedia]] must parse the
    * planted headers back out — which is what the m01/m02/m03 oracles
    * verify. */
  def fakeMediaFrame(documents: DataFrame): DataFrame = {
    def bytes(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
    def byteHex(c: Column): Column = lpad(hex(pmod(c, lit(256))), 2, "0")
    def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
    def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    def le16(c: Column): Column =
      unhex(concat(byteHex(c), byteHex(shiftright(c, 8))))
    def le32(c: Column): Column =
      unhex(concat(byteHex(c), byteHex(shiftright(c, 8)),
        byteHex(shiftright(c, 16)), byteHex(shiftright(c, 24))))

    val id = col("doc_id")
    val body = coalesce(col("text"), lit("")).cast("binary")
    val imgW = lit(16) + pmod(id, lit(624))
    val imgH = lit(16) + pmod(id, lit(464))
    // PNG: signature, IHDR length 13, "IHDR", w, h, bit depth 8, color
    // type 2 (truecolor), compression/filter/interlace 0, CRC (unchecked)
    val png = concat(
      bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 13, 0x49, 0x48, 0x44, 0x52),
      be32(imgW), be32(imgH), bytes(8, 2, 0, 0, 0, 0, 0, 0, 0), body)
    val rate = (lit(1) + pmod(id, lit(5))) * lit(8000)
    val chans = lit(1) + pmod(id, lit(2))
    // WAV: "RIFF" + size + "WAVE", canonical 16-byte PCM `fmt ` chunk
    val wav = concat(
      bytes(0x52, 0x49, 0x46, 0x46, 36, 0, 0, 0, 0x57, 0x41, 0x56, 0x45,
        0x66, 0x6d, 0x74, 0x20, 16, 0, 0, 0, 1, 0),
      le16(chans), le32(rate), le32(rate * chans * lit(2)),
      le16(chans * lit(2)), le16(lit(16)), body)

    // minimal-but-genuine MP4: ftyp(16) + moov = 300 + 4·n_frames bytes.
    // moov = mvhd(108) + trak; trak = tkhd(92) + mdia;
    // mdia = minf = stbl + 8 each; stbl = stts(24) + stsz(20 + 4n) + 8.
    // 30 fps at timescale 600 (delta 20 ticks), duration = n_frames * 20,
    // one stts run; stsz holds a REAL per-sample size table
    // (64 + (doc_id + i) % 191 bytes for sample i).
    val nFrames = lit(1) + pmod(id, lit(29))
    val mp4Dur = nFrames * lit(20)
    val stszSize = lit(20) + nFrames * lit(4)
    val stblSize = stszSize + lit(32)  // 8 + stts(24) + stsz
    val minfSize = stblSize + lit(8)
    val mdiaSize = minfSize + lit(8)
    val trakSize = mdiaSize + lit(100) // 8 + tkhd(92)
    val moovSize = trakSize + lit(116) // 8 + mvhd(108)
    val stszEntries = aggregate(
      transform(sequence(lit(0), nFrames - 1),
        i => be32(lit(64) + pmod(id + i, lit(191)))),
      lit(Array.empty[Byte]), (acc, x) => concat(acc, x))
    val unityMatrix = bytes(
      0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0x40, 0, 0, 0)
    val mp4 = concat(
      bytes(0, 0, 0, 16, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm', 0, 0, 0, 0),
      be32(moovSize), bytes('m', 'o', 'o', 'v'),
      // mvhd v0: timescale 600 = 0x258, duration varies
      bytes(0, 0, 0, 108, 'm', 'v', 'h', 'd', 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x02, 0x58),
      be32(mp4Dur),
      bytes(0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), // rate, volume, reserved
      unityMatrix,
      bytes(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0), // pre_defined[6]
      bytes(0, 0, 0, 2), // next_track_ID
      be32(trakSize), bytes('t', 'r', 'a', 'k'),
      // tkhd v0: flags 7 (enabled), track 1, duration varies
      bytes(0, 0, 0, 92, 't', 'k', 'h', 'd', 0, 0, 0, 7,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0),
      be32(mp4Dur),
      bytes(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), // reserved, layer/alt/vol/res
      unityMatrix,
      be16(imgW), bytes(0, 0), be16(imgH), bytes(0, 0), // 16.16 fixed point
      be32(mdiaSize), bytes('m', 'd', 'i', 'a'),
      be32(minfSize), bytes('m', 'i', 'n', 'f'),
      be32(stblSize), bytes('s', 't', 'b', 'l'),
      bytes(0, 0, 0, 24, 's', 't', 't', 's', 0, 0, 0, 0, 0, 0, 0, 1),
      be32(nFrames), bytes(0, 0, 0, 20),
      // stsz v0: sample_size 0 → per-sample table of n_frames entries
      be32(stszSize), bytes('s', 't', 's', 'z', 0, 0, 0, 0, 0, 0, 0, 0),
      be32(nFrames), stszEntries,
      body)

    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(id, lit(3)) + 1).cast("int"))
    documents.select(
      col("doc_id"),
      when(modality === "image", png)
        .when(modality === "audio", wav)
        .when(pmod(id, lit(6)) === 2, mp4)
        .otherwise(body).as("payload"),
      modality.as("modality"))
  }

  /** REAL audio resample by integer DECIMATION: decode 16-bit PCM mono
    * via javax.sound, keep every `factor`-th sample frame, re-encode as
    * a playable WAV at `rate / factor`. Integer sample selection — no
    * interpolation filter — so the output samples are an exact subset of
    * the input and the whole pipeline is mirrorable (a production
    * anti-aliased resampler would drop in here; decimation is the
    * deterministic skeleton). None for non-PCM input. */
  def resampleAudioPayload(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, s"decimation factor must be >= 1, got $factor")
    wavPcm(payload) match {
      case Some((rate, 16, 1, bytes)) =>
        val n = bytes.length / 2
        val out = Array.ofDim[Short]((n + factor - 1) / factor)
        var i = 0
        while (i * factor < n) {
          val p = i * factor * 2
          out(i) = ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort
          i += 1
        }
        Some(pcmWav(rate / factor, out))
      case _ => None
    }
  }

  /** Encode a horizontal+vertical gray GRADIENT as a real PNG:
    * pixel(x, y) = (seed + 3x + 7y) mod 256 in all three channels
    * (fixture helper for the perceptual-hash gate — gradients give dHash
    * non-trivial bit patterns where solid fills hash to all-zero). */
  def gradientPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    // hand-rolled gray encode ([[grayPng]]): same pixel VALUES as the
    // previous ImageIO RGB spelling (r=g=b=g ⇒ gray reduction is g),
    // same IHDR,IDAT,IEND chunk sequence, ~10× cheaper per payload and
    // thread-scaling (the r17 10× stress showed m16 8.6× on exactly
    // this per-image ImageIO round-trip)
    val g = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        g(y * w + x) = ((seed + 3L * x + 7L * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    grayPng(w, h, g)
  }

  /** Difference hash (dHash) of an image payload via a REAL ImageIO
    * decode: gray pixels average into a 9×8 grid of block means (integer
    * division end to end — reproducible on any engine), and each of the
    * 64 bits records whether a block mean exceeds its right neighbor.
    * Returned split into two 32-bit halves (bit index = row·8 + col;
    * `hi` holds indexes ≥ 32) so no sign bit is ever involved.
    *
    * This EXACT path requires width % 9 == 0 and height % 8 == 0 so
    * block means are uniform integer averages; production images go
    * through [[resizeImagePayload]] to such dimensions first. */
  def dHash64(payload: Array[Byte]): Option[(Int, Int, Long, Long)] =
    try {
      val grid = pngGray(payload) match {
        case Some((w, h, g)) => // hand-rolled decode: raw gray samples
          require(w % 9 == 0 && h % 8 == 0,
            s"dHash64 exact path needs w%9==0 && h%8==0, got ${w}x$h " +
              "(resize first)")
          val bw = w / 9; val bh = h / 8
          val sums = Array.ofDim[Long](9, 8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sums(x / bw)(y / bh) += (g(y * w + x) & 0xff).toLong
              x += 1
            }
            y += 1
          }
          Some((w, h, bw, bh, sums))
        case None => // ImageIO fallback (JPEG/GIF/BMP, exotic PNGs)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            require(w % 9 == 0 && h % 8 == 0,
              s"dHash64 exact path needs w%9==0 && h%8==0, got ${w}x$h " +
                "(resize first)")
            val bw = w / 9; val bh = h / 8
            val sums = Array.ofDim[Long](9, 8)
            val grayRd = grayRaster(img)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val gray = grayRd match {
                  case Some(gv) => gv(x, y).toLong
                  case None =>
                    val p = img.getRGB(x, y)
                    (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3L
                }
                sums(x / bw)(y / bh) += gray
                x += 1
              }
              y += 1
            }
            Some((w, h, bw, bh, sums))
          }
      }
      grid.map { case (w, h, bw, bh, sums) =>
        val n = bw.toLong * bh
        var hi = 0L; var lo = 0L
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            if (sums(cx)(cy) / n > sums(cx + 1)(cy) / n) {
              val idx = cy * 8 + cx
              if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
            }
            cx += 1
          }
          cy += 1
        }
        (w, h, hi, lo)
      }
    } catch { case _: Exception => None }

  /** Walk a PNG's chunk table — the real container-format parse an
    * ingestion pipeline runs before trusting a payload: after the 8-byte
    * signature, each chunk is length(4, big-endian) + type(4 ASCII) +
    * data + CRC32(4, over type||data). Returns one entry per chunk with
    * its declared length and whether the stored CRC matches a real
    * java.util.zip.CRC32 over the bytes — a corrupted or truncated file
    * surfaces as crc_ok=false or an early stop, never an exception.
    *
    * @return Seq of (chunk_index, type, data_length, crc_ok); empty when
    *         the signature is absent */
  def pngChunks(payload: Array[Byte]): Seq[(Int, String, Int, Boolean)] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (payload.length < 8 || !payload.take(8).sameElements(sig))
      return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Int, Boolean)]
    var off = 8
    var idx = 0
    var done = false
    while (!done && off + 12 <= payload.length) {
      val len = ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
        ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
      if (len < 0 || off.toLong + 12 + len > payload.length) done = true
      else {
        val tpe = new String(payload, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(payload, off + 4, 4 + len)
        val stored =
          ((payload(off + 8 + len) & 0xffL) << 24) |
            ((payload(off + 9 + len) & 0xffL) << 16) |
            ((payload(off + 10 + len) & 0xffL) << 8) |
            (payload(off + 11 + len) & 0xffL)
        out += ((idx, tpe, len, crc.getValue == stored))
        idx += 1
        off += 12 + len
        if (tpe == "IEND") done = true
      }
    }
    out.toSeq
  }

  /** Walk a RIFF/WAVE container's chunk table: after the 12-byte
    * RIFF/size/WAVE header, each chunk is fourcc(4) + size(4 LE) + data
    * (+1 pad byte when size is odd — the RIFF alignment rule). Returns
    * one (index, fourcc, size) per chunk; empty for non-RIFF bytes. */
  def wavChunks(payload: Array[Byte]): Seq[(Int, String, Int)] = {
    if (payload.length < 12) return Seq.empty
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E')) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int)]
    var off = 12
    var idx = 0
    while (off + 8 <= payload.length) {
      val fourcc = new String(payload, off, 4, "US-ASCII")
      val size = le32(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length)
        return out.toSeq
      out += ((idx, fourcc, size))
      idx += 1
      off += 8 + size + (size & 1)
    }
    out.toSeq
  }

  /** Insert a `JUNK` metadata chunk (the RIFF padding/annotation chunk
    * real tooling plants) immediately after `fmt ` — with the RIFF size
    * field corrected, so the result is a VALID wav any decoder accepts. */
  def insertWavJunkChunk(payload: Array[Byte],
      text: String): Array[Byte] = {
    val chunks = wavChunks(payload)
    require(chunks.exists(_._2 == "fmt "),
      "insertWavJunkChunk needs a valid RIFF/WAVE with fmt ")
    var off = 12
    var end = off
    chunks.takeWhile(_._2 != "fmt ").foreach { c =>
      off += 8 + c._3 + (c._3 & 1)
    }
    val fmt = chunks.find(_._2 == "fmt ").get
    end = off + 8 + fmt._3 + (fmt._3 & 1)
    val data = text.getBytes("US-ASCII")
    val padded = data.length + (data.length & 1)
    val chunk = java.nio.ByteBuffer.allocate(8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("JUNK".getBytes("US-ASCII")).putInt(data.length).put(data)
    val body = payload.take(end) ++ chunk.array() ++ payload.drop(end)
    writeRiffSize(body)
  }

  /** Strip every non-essential chunk from a WAV (everything but `fmt `
    * and `data` — JUNK, LIST/INFO author strings, bext broadcast
    * metadata, …): the audio-side metadata scrub, with the RIFF size
    * field recomputed so the rebuilt file stays decodable. Sample bytes
    * are untouched by construction. */
  def stripWavMetadata(payload: Array[Byte]): Array[Byte] = {
    val chunks = wavChunks(payload)
    if (chunks.isEmpty) return payload
    val out = new java.io.ByteArrayOutputStream()
    out.write(payload, 0, 12)
    var off = 12
    chunks.foreach { case (_, fourcc, size) =>
      val span = 8 + size + (size & 1)
      if (fourcc == "fmt " || fourcc == "data")
        out.write(payload, off, math.min(span, payload.length - off))
      off += span
    }
    writeRiffSize(out.toByteArray)
  }

  private def writeRiffSize(b: Array[Byte]): Array[Byte] = {
    val size = b.length - 8
    b(4) = (size & 0xff).toByte
    b(5) = ((size >> 8) & 0xff).toByte
    b(6) = ((size >> 16) & 0xff).toByte
    b(7) = ((size >> 24) & 0xff).toByte
    b
  }

  /** Insert an ancillary `tEXt` metadata chunk (keyword\0text, real
    * CRC32) immediately after the IHDR chunk — how EXIF-era tooling
    * plants provenance/author strings in PNGs, and the fixture-side
    * planter for [[stripAncillaryChunks]]'s scrub test. */
  def insertTextChunk(payload: Array[Byte], keyword: String,
      text: String): Array[Byte] = {
    val chunks = pngChunks(payload)
    require(chunks.nonEmpty && chunks.head._2 == "IHDR",
      "insertTextChunk needs a valid PNG starting with IHDR")
    val ihdrEnd = 8 + 12 + chunks.head._3
    val data = (keyword + "\u0000" + text).getBytes("ISO-8859-1")
    val chunk = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    chunk.write(be32(data.length))
    val typeAndData = "tEXt".getBytes("US-ASCII") ++ data
    chunk.write(typeAndData)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    chunk.write(be32(crc.getValue))
    payload.take(ihdrEnd) ++ chunk.toByteArray ++ payload.drop(ihdrEnd)
  }

  /** Strip every ANCILLARY chunk (lowercase first type letter — tEXt,
    * iTXt, zTXt, tIME, eXIf, …) from a PNG, keeping only critical ones
    * (IHDR/PLTE/IDAT/IEND): the image-side PII/metadata SCRUB a
    * training-data pipeline runs before payloads enter the corpus —
    * provenance strings, GPS text, editor fingerprints all live in
    * ancillary chunks, and pixel content is untouched by construction.
    * Returns the rebuilt byte stream (bit-identical chunks, original
    * order, signature preserved). */
  def stripAncillaryChunks(payload: Array[Byte]): Array[Byte] = {
    val chunks = pngChunks(payload)
    if (chunks.isEmpty) return payload
    val out = new java.io.ByteArrayOutputStream()
    out.write(payload, 0, 8)
    var off = 8
    chunks.foreach { case (_, tpe, len, _) =>
      val critical = (tpe.charAt(0) & 0x20) == 0
      if (critical) out.write(payload, off, 12 + len)
      off += 12 + len
    }
    out.toByteArray
  }

  /** Per-tile FNV-1a64 fingerprints of an image payload via a REAL
    * ImageIO decode: the image splits into non-overlapping `tile`×`tile`
    * blocks (exact path — dimensions must divide evenly, like
    * [[dHash64]]'s grid contract) and each block's row-major gray bytes
    * (integer (r+g+b)/3, same reduction as [[dHash64]]) hash through
    * [[graft.functions.GraftHash.fnv1a64]]. Equal tiles ⇒ equal hashes
    * deterministically, so a tile-hash equi-join finds SUB-image overlap
    * (crops, collages, shifted re-encodes) that whole-image perceptual
    * hashing (m07/m10) is blind to.
    *
    * @return one (tx, ty, hash) per tile, row-major; None on undecodable
    *         payloads */
  def tileHashes(payload: Array[Byte],
      tile: Int = 8): Option[Seq[(Int, Int, Long)]] =
    pngGray(payload) match {
      case Some((w, h, g)) => // hand-rolled decode: raw gray samples
        try {
          require(w % tile == 0 && h % tile == 0,
            s"tileHashes exact path needs dims divisible by $tile, " +
              s"got ${w}x$h (resize first)")
          val out = for (ty <- 0 until h / tile; tx <- 0 until w / tile)
            yield {
              val bytes = new Array[Byte](tile * tile)
              var j = 0
              var y = ty * tile
              while (y < (ty + 1) * tile) {
                System.arraycopy(g, y * w + tx * tile, bytes, j, tile)
                j += tile
                y += 1
              }
              (tx, ty, graft.functions.GraftHash.fnv1a64(bytes))
            }
          Some(out)
        } catch { case _: Exception => None }
      case None => tileHashesImageIO(payload, tile)
    }

  /** ImageIO fallback for payloads the hand PNG path declines
    * (JPEG/GIF/BMP, 16-bit, palette, interlaced). */
  private def tileHashesImageIO(payload: Array[Byte],
      tile: Int): Option[Seq[(Int, Int, Long)]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        require(w % tile == 0 && h % tile == 0,
          s"tileHashes exact path needs dims divisible by $tile, " +
            s"got ${w}x$h (resize first)")
        val grayRd = grayRaster(img)
        val out = for (ty <- 0 until h / tile; tx <- 0 until w / tile)
          yield {
            val bytes = new Array[Byte](tile * tile)
            var j = 0
            var y = ty * tile
            while (y < (ty + 1) * tile) {
              var x = tx * tile
              while (x < (tx + 1) * tile) {
                val gray = grayRd match {
                  case Some(gv) => gv(x, y)
                  case None =>
                    val p = img.getRGB(x, y)
                    (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
                }
                bytes(j) = gray.toByte
                j += 1
                x += 1
              }
              y += 1
            }
            (tx, ty, graft.functions.GraftHash.fnv1a64(bytes))
          }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** Best-overlap partner per document over a (doc_id, thash) tile
    * fingerprint table: equi-join on the 8-byte hash, resident side
    * capped at the `bucketCap` lowest ids per tile content (the
    * d20/StreamingDedup skew discipline — a boilerplate tile shared by
    * every screenshot fans out O(cap·members), never members²), then the
    * two-aggregate argmax readout (max shared count, min partner id on
    * ties — both partial-aggregable).
    *
    * @return (doc_id, partner, shared_tiles) for docs whose best partner
    *         shares ≥ `minShared` tile contents. */
  def tileOverlapBestPartner(tiles: DataFrame, bucketCap: Int = 1000,
      minShared: Long = 2L): DataFrame = {
    val res = tiles
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("thash")).orderBy(col("doc_id"))))
      .filter(col("rn") <= bucketCap)
      .select(col("doc_id").as("partner"), col("thash"))
    val cand = tiles.join(res, "thash")
      .filter(col("partner") =!= col("doc_id"))
      .groupBy(col("doc_id"), col("partner"))
      .agg(count(lit(1)).as("shared"))
    val mx = cand.groupBy("doc_id").agg(max(col("shared")).as("ms"))
    cand.join(mx, "doc_id").filter(col("shared") === col("ms"))
      .groupBy(col("doc_id"), col("ms"))
      .agg(min(col("partner")).as("partner"))
      .filter(col("ms") >= minShared)
      .select(col("doc_id"), col("partner"), col("ms").as("shared_tiles"))
  }
}
