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
}
