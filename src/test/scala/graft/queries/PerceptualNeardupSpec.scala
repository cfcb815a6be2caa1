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
}
