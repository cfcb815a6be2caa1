package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftHash

/** Tile-hash crop detection (m16): real decode round-trip, the
  * injectivity claim the oracle's residue join rests on, and the
  * bucket-cap skew guard. */
class TileNeardupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("FNV tile hashes are injective over all 256 gradient contents") {
    // a gradient tile's bytes are fully determined by its origin residue
    // r: gray(i, j) = (r + 3i + 7j) mod 256 — the oracle joins on r, the
    // engine on the hash of decoded bytes; equal iff no hash collision
    val hashes = (0 until 256).map { r =>
      val bytes = new Array[Byte](64)
      for (j <- 0 until 8; i <- 0 until 8)
        bytes(j * 8 + i) = ((r + 3 * i + 7 * j) % 256).toByte
      GraftHash.fnv1a64(bytes)
    }
    assert(hashes.distinct.size == 256)
  }

  test("a genuine crop's tiles all appear in the source image") {
    // B(seed 124) IS the (8,0)-offset crop of A(seed 100):
    // grayB(x, y) = 124 + 3x + 7y = 100 + 3(x+8) + 7y = grayA(x+8, y)
    val a = Multimodal.tileHashes(Multimodal.gradientPng(32, 16, 100L)).get
    val b = Multimodal.tileHashes(Multimodal.gradientPng(16, 16, 124L)).get
    assert(a.size == 8 && b.size == 4)
    val aSet = a.map(_._3).toSet
    assert(b.forall(t => aSet.contains(t._3)), (a, b).toString)
    // decode really ran: hashes match the direct byte-level prediction
    val predicted = GraftHash.fnv1a64(
      (for (j <- 0 until 8; i <- 0 until 8)
        yield ((100 + 3 * i + 7 * j) % 256).toByte).toArray)
    assert(a.head._3 == predicted, "tile (0,0) must hash the raw gradient")
    // an unrelated seed (odd offset unreachable by 3dx+7dy steps inside
    // one tile row alignment) shares nothing
    val c = Multimodal.tileHashes(Multimodal.gradientPng(16, 16, 101L)).get
    assert(!c.exists(t => aSet.contains(t._3)))
  }

  test("bucket cap bounds a hot tile content's fan-out; best partner " +
    "survives") {
    import spark.implicits._
    // 100 docs all share hot content h0; docs 1 and 2 also share h1+h2
    val rows =
      (1L to 100L).map(d => (d, 7777L)) ++
        Seq((1L, 11L), (2L, 11L), (1L, 22L), (2L, 22L))
    val tiles = rows.toDF("doc_id", "thash")
    val out = Multimodal.tileOverlapBestPartner(tiles, bucketCap = 5,
      minShared = 2L).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // only the 1↔2 pair shares ≥2 contents; hot-bucket pairs cap at 1
    assert(out == Map(1L -> (2L, 3L), 2L -> (1L, 3L)), out.toString)
    // fan-out proof: with cap 5, the hot bucket contributes ≤ 5·100
    // candidate rows instead of 100²
    val res = tiles
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"thash").orderBy($"doc_id")))
      .filter($"rn" <= 5)
    val candRows = tiles.join(res.select($"doc_id".as("partner"), $"thash"),
      "thash").filter($"partner" =!= $"doc_id").count()
    assert(candRows <= 5L * 100 + 4, s"hot bucket not capped: $candRows")
  }
}
