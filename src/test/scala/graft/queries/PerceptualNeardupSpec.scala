package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** m10 ground truth: the banded (pigeonhole) perceptual near-dup join must
  * equal the brute-force all-pairs scan over distinct dHashes — banding is
  * a candidate-generation optimization, never a semantics change at
  * maxHamming 3 with 4×16-bit chunks. */
class PerceptualNeardupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("m13: audio fingerprint is volume-invariant; planted copies found") {
    // the Haitsma-Kalker property the gate's copies exploit: pure volume
    // scaling preserves every energy-delta sign, so the fingerprint is
    // IDENTICAL; only the dropped frame flips bits (<= 2)
    def fingerprint(samples: Array[Short]): Long = {
      val dec = Multimodal.decodeAudioSamples(
        Multimodal.pcmWav(8000, samples)).get
      val e = dec.grouped(8).map(_.map(s => math.abs(s.toLong)).sum).toArray
      var fp = 0L
      var w = 1
      while (w < 64) { if (e(w) > e(w - 1)) fp |= 1L << (w - 1); w += 1 }
      fp
    }
    val base = 37L
    val raw = Array.tabulate(512) { i =>
      val carrier = ((base * 31 + i.toLong * 17) % 65521) - 32760
      ((carrier / 5) *
        (1 + ((base * 2654435761L + (i / 8).toLong * 40503L) % 8191) % 5))
        .toShort
    }
    val halfVolume = raw.map(v => (v / 2).toShort)
    assert(fingerprint(raw) == fingerprint(halfVolume),
      "volume scaling must not change the fingerprint")
    val dropped = raw.zipWithIndex.map { case (v, i) =>
      if (i / 8 == 29) 0.toShort else v
    }
    val ham = java.lang.Long.bitCount(fingerprint(raw) ^ fingerprint(dropped))
    assert(ham >= 1 && ham <= 2, s"dropped frame flips 1-2 bits, got $ham")

    // the gate finds at least one original->copy pair at every SF's corpus
    val out = graft.SparkEntry.queries("m13_audio_fingerprint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.exists(r => r.getLong(1) >= 1000000L),
      "planted scaled+dropped copies must surface as near-dup pairs")
    assert(out.forall(_.getLong(2) <= 3))
  }

  test("banded near-dup pairs equal brute force over distinct hashes") {
    val dir = "/root/testdata/sf0.001"
    val banded = MultimodalQueries.m10PerceptualNeardup(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

    // Independent ground truth: hash every image locally, group to
    // distinct hashes, compare ALL pairs.
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 3 == 0)
    val hashed = ids.map { id =>
      val w = (9 * (1 + id % 3)).toInt
      val h = (8 * (1 + id % 2)).toInt
      val (_, _, hi, lo) = Multimodal.dHash64(
        Multimodal.gradientPng(w, h, id)).get
      (id, hi, lo)
    }
    val groups = hashed.groupBy(x => (x._2, x._3)).map { case ((hi, lo), xs) =>
      (xs.map(_._1).min, hi, lo, xs.size.toLong)
    }.toSeq.sortBy(_._1)
    val expected = for {
      (ra, hiA, loA, ca) <- groups
      (rb, hiB, loB, cb) <- groups
      if ra < rb
      ham = java.lang.Long.bitCount(hiA ^ hiB) +
        java.lang.Long.bitCount(loA ^ loB)
      if ham <= 3
    } yield (ra, rb, ham.toLong, ca, cb)

    assert(banded.sorted == expected.sorted)
    assert(banded.nonEmpty) // the fixture genuinely exercises the join
  }

  test("pngChunks: real walk, corruption detected, garbage rejected") {
    import graft.operators.Multimodal
    val png = Multimodal.gradientPng(9, 8, 42L)
    val chunks = Multimodal.pngChunks(png)
    assert(chunks.map(_._2) == Seq("IHDR", "IDAT", "IEND"), chunks.toString)
    assert(chunks.forall(_._4), "fresh encoder output must CRC-verify")
    assert(chunks.head._3 == 13, "IHDR data is 13 bytes by spec")
    // flip one byte inside IDAT's data: its CRC must fail, others hold
    val corrupt = png.clone()
    val idatDataOff = 8 + 12 + 13 + 8 // sig + IHDR chunk + IDAT hdr
    corrupt(idatDataOff) = (corrupt(idatDataOff) ^ 0x7f).toByte
    val cc = Multimodal.pngChunks(corrupt)
    assert(!cc(1)._4 && cc(0)._4 && cc(2)._4, cc.toString)
    // truncation mid-chunk: the walk stops cleanly at the last whole chunk
    val trunc = Multimodal.pngChunks(png.take(png.length - 6))
    assert(trunc.map(_._2) == Seq("IHDR", "IDAT"), trunc.toString)
    // not a PNG at all
    assert(Multimodal.pngChunks("plain text".getBytes("UTF-8")).isEmpty)
  }
}
