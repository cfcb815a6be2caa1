package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Generative parity for the hand-rolled WAV codec: over ADVERSARIAL
  * RIFF structures — junk chunks in arbitrary positions, odd-length
  * payloads with pad bytes, multiple data chunks, 8/16/24-bit and
  * 1/2-channel integer PCM, canonical and WAVE_FORMAT_EXTENSIBLE fmt
  * chunks, and late-patched (oversized) data sizes — [[Multimodal.wavPcm]]
  * must parse-or-reject IDENTICALLY to the JDK codec it displaced:
  * accept exactly when javax.sound yields a little-endian integer-PCM
  * stream, and then agree bit-for-bit on (rate, bits, channels, frame
  * bytes). `WavCodecParitySpec` pins the enumerated gate shapes; this
  * closes the hand-rolled codec's generative coverage (the xlsx codec
  * has `XlsxRoundTripProps`).
  */
object WavCodecProps extends Properties("wav.codec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(150)

  /** JDK reference decode: Some((rate, bits, channels, frameBytes)) when
    * javax.sound reads the payload as little-endian INTEGER PCM (signed
    * or — 8-bit WAV's canonical spelling — unsigned); None otherwise. */
  private def jdkIntPcm(payload: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    val ais = Multimodal.audioInputStream(payload)
    if (ais == null) return None
    try {
      val f = ais.getFormat
      val enc = f.getEncoding
      val isInt =
        enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      if (!isInt || (f.getSampleSizeInBits > 8 && f.isBigEndian)) None
      else Some((f.getSampleRate.toInt, f.getSampleSizeInBits,
        f.getChannels, ais.readAllBytes()))
    } finally ais.close()
  }

  private final case class WavCase(rate: Int, bits: Int, channels: Int,
      data: Array[Byte], extensible: Boolean, preJunk: List[Array[Byte]],
      midJunk: List[Array[Byte]], extraData: Option[Array[Byte]],
      lieBytes: Int)

  private val genJunk: Gen[Array[Byte]] = for {
    t <- Gen.listOfN(4, Gen.choose('A', 'Z')).map(_.mkString)
    n <- Gen.chooseNum(0, 37) // odd sizes exercise the RIFF pad rule
    body <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
  } yield {
    val b = java.nio.ByteBuffer
      .allocate(8 + n + (n & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(t.getBytes("US-ASCII")).putInt(n).put(body.toArray)
    // pad byte (if any) stays zero
    b.array()
  }

  private val genCase: Gen[WavCase] = for {
    rate <- Gen.oneOf(8000, 16000, 44100)
    bits <- Gen.oneOf(8, 16, 24)
    channels <- Gen.oneOf(1, 2)
    frames <- Gen.chooseNum(0, 200)
    data <- Gen.listOfN(frames * channels * (bits / 8),
      Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
    extensible <- Gen.oneOf(true, false)
    preJunk <- Gen.listOf(genJunk).map(_.take(2))
    midJunk <- Gen.listOf(genJunk).map(_.take(2))
    extraData <- Gen.option(Gen.listOfN(16, Gen.chooseNum(0, 255)
      .map(_.toByte)).map(_.toArray))
    lieBytes <- Gen.oneOf(0, 0, 0, 1000) // 25% late-patched data size
  } yield WavCase(rate, bits, channels, data, extensible, preJunk,
    midJunk, extraData, lieBytes)

  /** Assemble: RIFF [preJunk*] fmt [midJunk*] data [extraData] with the
    * declared data size optionally inflated by `lieBytes` (a writer that
    * never came back to patch it). */
  private def assemble(c: WavCase): Array[Byte] = {
    val fmtLen = if (c.extensible) 40 else 16
    val blockAlign = c.channels * (c.bits / 8)
    val fmt = {
      val b = java.nio.ByteBuffer.allocate(8 + fmtLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("fmt ".getBytes("US-ASCII")).putInt(fmtLen)
        .putShort(if (c.extensible) 0xFFFE.toShort else 1)
        .putShort(c.channels.toShort)
        .putInt(c.rate).putInt(c.rate * blockAlign)
        .putShort(blockAlign.toShort).putShort(c.bits.toShort)
      if (c.extensible)
        b.putShort(22).putShort(c.bits.toShort).putInt(0x3)
          .put(Array[Byte](1, 0, 0, 0, 0, 0, 0x10, 0, 0x80.toByte, 0, 0,
            0xAA.toByte, 0, 0x38, 0x9B.toByte, 0x71))
      b.array()
    }
    val dataChunk = {
      val b = java.nio.ByteBuffer
        .allocate(8 + c.data.length + (c.data.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("data".getBytes("US-ASCII"))
        .putInt(c.data.length + c.lieBytes).put(c.data)
      b.array()
    }
    val extra = c.extraData.map { d =>
      val b = java.nio.ByteBuffer.allocate(8 + d.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("data".getBytes("US-ASCII")).putInt(d.length).put(d)
      b.array()
    }.toList
    val chunks = c.preJunk ++ List(fmt) ++ c.midJunk ++
      List(dataChunk) ++ extra
    val payload = chunks.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(12 + payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + payload)
      .put("WAVE".getBytes("US-ASCII"))
    chunks.foreach(out.put)
    out.array()
  }

  property("parse-or-reject identically to the JDK over adversarial " +
    "RIFF structure; accepted payloads agree bit-for-bit") =
    Prop.forAll(genCase) { c =>
      val wav = assemble(c)
      val hand = Multimodal.wavPcm(wav)
      val jdk = jdkIntPcm(wav)
      (hand, jdk) match {
        case (Some((hr, hb, hc, hd)), Some((jr, jb, jc, jd))) =>
          (hr == jr && hb == jb && hc == jc) :| s"format: hand=($hr,$hb,$hc) jdk=($jr,$jb,$jc)" &&
            (hd.toSeq == jd.toSeq) :| s"payload bytes differ (${hd.length} vs ${jd.length})"
        case (None, None) => Prop.passed
        case other =>
          false :| s"acceptance disagrees: hand=${hand.map(_._4.length)} " +
            s"jdk=${jdk.map(_._4.length)} case=$c"
      }
    }

  property("decodeAudioSamples round-trips pcmWav for any sample array") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))) {
      xs =>
        val arr = xs.toArray
        val back = Multimodal.decodeAudioSamples(
          Multimodal.pcmWav(16000, arr))
        (back.isDefined && back.get.toSeq == arr.toSeq) :| "round-trip"
    }
}
