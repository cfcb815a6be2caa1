package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PNG metadata scrub (m17): real chunk injection, real CRC, real
  * rebuild — byte-level round-trip evidence, no Spark needed. */
class MetadataScrubSpec extends AnyFunSuite {

  test("inject → strip round-trips to the original bytes") {
    val png = Multimodal.gradientPng(18, 16, 42L)
    val tagged = Multimodal.insertTextChunk(png, "src", "doc42")
    // planted chunk sits second, is ancillary, and carries a VALID crc
    val chunks = Multimodal.pngChunks(tagged)
    assert(chunks.map(_._2) == Seq("IHDR", "tEXt", "IDAT", "IEND"))
    assert(chunks.forall(_._4), s"crc must verify: $chunks")
    assert(chunks(1)._3 == "src doc42".length)
    // strip restores the EXACT original byte stream
    val stripped = Multimodal.stripAncillaryChunks(tagged)
    assert(stripped.sameElements(png))
    // pixels untouched: decode still works and dHash agrees
    assert(Multimodal.dHash64(stripped) == Multimodal.dHash64(png))
  }

  test("strip keeps critical chunks only, preserves order, skips " +
    "non-PNG payloads") {
    val png = Multimodal.gradientPng(9, 8, 7L)
    val multi = Multimodal.insertTextChunk(
      Multimodal.insertTextChunk(png, "a", "x"), "b", "y")
    assert(Multimodal.pngChunks(multi).size == 5)
    val stripped = Multimodal.stripAncillaryChunks(multi)
    assert(Multimodal.pngChunks(stripped).map(_._2) ==
      Seq("IHDR", "IDAT", "IEND"))
    // non-PNG bytes pass through untouched
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.stripAncillaryChunks(junk).sameElements(junk))
  }

  test("WAV: inject JUNK → strip round-trips; odd payloads pad; RIFF " +
    "size stays correct") {
    val samples = Array.tabulate(64)(i => (i * 100 - 3000).toShort)
    val wav = Multimodal.pcmWav(8000, samples)
    assert(Multimodal.wavChunks(wav).map(_._2) == Seq("fmt ", "data"))
    // odd-length payload exercises the RIFF pad byte
    val tagged = Multimodal.insertWavJunkChunk(wav, "abc")
    assert(Multimodal.wavChunks(tagged).map(_._2) ==
      Seq("fmt ", "JUNK", "data"))
    // RIFF size field == bytes after the 8-byte header, post-insert
    def riffSize(b: Array[Byte]) =
      (b(4) & 0xff) | ((b(5) & 0xff) << 8) | ((b(6) & 0xff) << 16) |
        ((b(7) & 0xff) << 24)
    assert(riffSize(tagged) == tagged.length - 8)
    assert(tagged.length - wav.length == 8 + 3 + 1, "pad byte expected")
    // the tagged file still DECODES (valid container), samples intact
    assert(Multimodal.decodeAudioSamples(tagged).get.sameElements(samples))
    val stripped = Multimodal.stripWavMetadata(tagged)
    assert(stripped.sameElements(wav))
    assert(Multimodal.decodeAudioSamples(stripped).get
      .sameElements(samples))
  }
}
