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

  test("declared chunk size near 2^31 returns None, never indexes " +
    "b(negative) (r19 ADVICE: Int-overflowing bounds math)") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = "WAVE".getBytes ++ chunks.flatten
      "RIFF".getBytes ++ le32(body.length.toLong) ++ body
    }
    def chunk(id: String, declared: Long, payload: Array[Byte]): Array[Byte] =
      id.getBytes ++ le32(declared) ++ payload
    val huge = Int.MaxValue.toLong - 4 // i+8+size wraps an Int sum negative
    // non-data chunk with a huge declared size: structure broken → None
    assert(Multimodal.wavPcm(
      riff(chunk("JUNK", huge, Array.fill[Byte](16)(0)))).isEmpty)
    // huge-size DATA chunk BEFORE fmt (the accepted-truncation path):
    // data is truncated to what is present, the walk must then END —
    // pre-fix the Int advance wrapped negative and read b(negative)
    assert(Multimodal.wavPcm(
      riff(chunk("data", huge, Array.fill[Byte](32)(1)))).isEmpty)
    // huge-size data AFTER a valid fmt: decodes, truncated + frame-aligned
    val fmt16 = Array[Byte](1, 0, 1, 0) ++ le32(8000) ++ le32(16000) ++
      Array[Byte](2, 0, 16, 0)
    val wav = riff(chunk("fmt ", 16, fmt16),
      chunk("data", huge, Array.fill[Byte](10)(3)))
    val out = Multimodal.wavPcm(wav)
    assert(out.isDefined && out.get._4.length == 10,
      s"truncated huge-declared data chunk should decode, got $out")
  }

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
  }

  test("oversized declared data size truncates to available bytes " +
    "(streaming writers patch sizes late), matching the JDK codec") {
    // canonical 64-sample WAV whose data chunk CLAIMS 0x7f7f bytes: the
    // JDK reads the 128 bytes actually present (verified: readAllBytes
    // = 128 on this exact payload) — rejecting was an r17 parity break
    val wav = Multimodal.pcmWav(8000, samples(64, 1L))
    val lying = wav.clone(); lying(40) = 127; lying(41) = 127
    assertParity(lying)
    assert(Multimodal.wavPcm(lying).get._4.toSeq ==
      Multimodal.wavPcm(wav).get._4.toSeq,
      "truncated decode must equal the honest-size decode")
    // a lying NON-data chunk is still a structural break: refuse
    val wavJunk = Multimodal.insertWavJunkChunk(wav, "rec7")
    // find the junk chunk ('LIST' or similar) and inflate its size past
    // the buffer; fmt-chunk lies are equally fatal
    val fmtLying = wav.clone(); fmtLying(16) = 127; fmtLying(17) = 127
    assert(Multimodal.wavPcm(fmtLying).isEmpty)
    assert(wavJunk.length > wav.length) // junk fixture sanity
  }

  /** WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) integer-PCM builder: the fmt
    * chunk carries cbSize=22 + validBits + channelMask + a 16-byte
    * subformat GUID; multichannel and >16-bit writers emit this tag for
    * plain PCM payloads. */
  private def extensibleWav(rate: Int, xs: Array[Short],
      pcmGuid: Boolean): Array[Byte] = {
    val dataLen = xs.length * 2
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 40 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 40 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(40)
      .putShort(0xFFFE.toShort).putShort(1) // extensible, mono
      .putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16) // block align, container bits
      .putShort(22).putShort(16).putInt(0x4) // cbSize, validBits, mask
    val sub = if (pcmGuid) 1 else 3 // PCM vs IEEE-float subformat
    buf.put(Array[Byte](sub.toByte, 0, 0, 0, 0, 0, 0x10, 0, 0x80.toByte,
      0, 0, 0xAA.toByte, 0, 0x38, 0x9B.toByte, 0x71))
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    xs.foreach(buf.putShort)
    buf.array()
  }

  test("WAVE_FORMAT_EXTENSIBLE integer PCM accepted identically to the " +
    "JDK; extensible float subformat refused by both") {
    val xs = samples(256, 11L)
    val pcm = extensibleWav(8000, xs, pcmGuid = true)
    assertParity(pcm) // JDK: PCM_SIGNED, 512 bytes — hand decode agrees
    assert(Multimodal.wavPcm(pcm).get._4.length == 512)
    assert(Multimodal.decodeAudioSamples(pcm).get.toSeq == xs.toSeq,
      "extensible-PCM samples must round-trip bit-exactly")
    // float subformat: JDK reports PCM_FLOAT (filtered to None by
    // jdkDecode's PCM_SIGNED gate), hand decode refuses the GUID — both
    // sides None, never float bits reinterpreted as integer samples
    assertParity(extensibleWav(8000, xs, pcmGuid = false))
    assert(Multimodal.wavPcm(extensibleWav(8000, xs, pcmGuid = false)).isEmpty)
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
    // measured SLOWER at 8 threads than 1 — a hard global lock).
    // Load-sensitive ratio: only on an idle >=8-core host (or
    // GRAFT_TIMING_ASSERTS=1); the decode work above always ran.
    if (graft.TimingAsserts.enabled())
      assert(t8 * 2 < t1,
        f"decode does not thread-scale: 1-thread $t1%.0f ms vs 8-thread $t8%.0f ms")
    else info(f"timing assertion skipped (busy/low-core host): " +
      f"1-thread $t1%.0f ms vs 8-thread $t8%.0f ms")
  }
}
