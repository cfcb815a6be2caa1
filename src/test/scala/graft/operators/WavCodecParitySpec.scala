package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Bit-for-bit parity between the hand-rolled RIFF/PCM decode
  * ([[Multimodal.wavPcm]] — the hot path; javax.sound's reader stack
  * holds JVM-global locks) and the JDK codec it replaced. Every payload
  * class the gates produce is covered, plus the rejection cases. */
class WavCodecParitySpec extends AnyFunSuite {

  /** JDK-codec reference decode: (rate, bits, channels, frame bytes), or
    * None when the payload is not signed little-endian integer PCM. */
  private def jdkDecode(payload: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    val ais = Multimodal.audioInputStream(payload)
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.isBigEndian) None
      else Some((fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
        fmt.getChannels, ais.readAllBytes()))
    } finally ais.close()
  }

  private def assertParity(payload: Array[Byte]): Unit = {
    val hand = Multimodal.wavPcm(payload)
    val jdk = jdkDecode(payload)
    (hand, jdk) match {
      case (Some((hr, hb, hc, hd)), Some((jr, jb, jc, jd))) =>
        assert(hr == jr && hb == jb && hc == jc, "format fields differ")
        assert(hd.toSeq == jd.toSeq, "PCM payload bytes differ")
      case (None, None) => ()
      case other => fail(s"decoders disagree on acceptance: $other")
    }
  }

  private def samples(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n)(i => (((seed * 31 + i.toLong * 17) % 65521) - 32760).toShort)

  test("canonical pcmWav payloads: rates, lengths, empty") {
    for (rate <- Seq(8000, 16000, 44100); n <- Seq(0, 1, 50, 256, 999))
      assertParity(Multimodal.pcmWav(rate, samples(n, rate + n)))
  }

  test("gate-produced payload shapes: junk-chunk tagged and stripped") {
    val wav = Multimodal.pcmWav(8000, samples(256, 7L))
    val tagged = Multimodal.insertWavJunkChunk(wav, "rec7")
    assertParity(tagged)
    assertParity(Multimodal.stripWavMetadata(tagged))
    // the hand decode must ALSO agree the junk chunk does not change PCM
    assert(Multimodal.wavPcm(tagged).get._4.toSeq ==
      Multimodal.wavPcm(wav).get._4.toSeq)
  }

  test("stereo 16-bit PCM accepted identically by both") {
    // hand-build a canonical stereo WAV (pcmWav is mono-only)
    val frames = 100
    val dataLen = frames * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2) // PCM, stereo
      .putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples(frames * 2, 3L).foreach(buf.putShort)
    assertParity(buf.array())
    assert(Multimodal.wavPcm(buf.array()).get._3 == 2)
    // and the mono-only sample decode rejects it
    assert(Multimodal.decodeAudioSamples(buf.array()).isEmpty)
  }

  test("rejections: garbage, truncated, non-PCM format tag") {
    assert(Multimodal.wavPcm("not a wav at all".getBytes).isEmpty)
    val wav = Multimodal.pcmWav(8000, samples(64, 1L))
    assert(Multimodal.wavPcm(wav.take(20)).isEmpty)
    // flip the fmt tag to 3 (IEEE float): integer-PCM decode must refuse
    val float = wav.clone(); float(20) = 3
    assert(Multimodal.wavPcm(float).isEmpty)
    // oversized declared chunk (structural lie) refuses instead of OOB
    val lying = wav.clone(); lying(40) = 127; lying(41) = 127
    assert(Multimodal.wavPcm(lying).isEmpty)
  }

  test("decode work THREAD-SCALES (the reason the hot path is hand-rolled)") {
    val payloads = (0 until 4000).map(i =>
      Multimodal.pcmWav(8000, samples(256, i.toLong))).toArray
    def work(slice: Range): Unit = slice.foreach { i =>
      assert(Multimodal.decodeAudioSamples(payloads(i % payloads.length)).get
        .length == 256)
    }
    // warm
    work(0 until 8000)
    val rows = 512000 // large enough that thread startup is noise
    val t1 = { val t0 = System.nanoTime(); work(0 until rows)
      (System.nanoTime() - t0) / 1e6 }
    val t8 = {
      val t0 = System.nanoTime()
      val per = rows / 8
      val th = (0 until 8).map { t =>
        new Thread(new Runnable {
          def run(): Unit = work(t * per until (t + 1) * per) }) }
      th.foreach(_.start()); th.foreach(_.join())
      (System.nanoTime() - t0) / 1e6
    }
    // same total rows: 8 threads must be at least 2x faster (javax.sound
    // measured SLOWER at 8 threads than 1 — a hard global lock)
    assert(t8 * 2 < t1,
      f"decode does not thread-scale: 1-thread $t1%.0f ms vs 8-thread $t8%.0f ms")
  }
}
