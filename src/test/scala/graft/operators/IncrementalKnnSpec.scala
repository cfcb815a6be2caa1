package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ANN index maintenance (s16): the persisted-index
  * contract, the bucket cap, and cosine ranking on controlled vectors. */
class IncrementalKnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("identical vectors rank by id; batch probes history and itself") {
    val hist = vecs(1L -> Seq(1.0f, 0.0f), 2L -> Seq(1.0f, 0.0f),
      3L -> Seq(1.0f, 0.0f), 4L -> Seq(0.0f, 1.0f))
    val batch = vecs(107L -> Seq(1.0f, 0.0f), 117L -> Seq(1.0f, 0.0f))
    val idx = Similarity.quantizedBandIndex(hist, "vec_id", "embedding")
    val out = Similarity.incrementalKnn(idx, hist, batch, "vec_id",
      "embedding", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cos-1.0 ties break by nid asc: 1, 2, 3 for each query — the twin
    // batch vector (cos 1.0, id 107/117) loses the id tiebreak to 1..3
    assert(out == Set((107L, 1L, 1L), (107L, 2L, 2L), (107L, 3L, 3L),
      (117L, 1L, 1L), (117L, 2L, 2L), (117L, 3L, 3L)), out.toString)
  }

  test("the persisted index IS the probe surface — dropped rows are " +
    "invisible even when the vector is in the store") {
    val hist = vecs(1L -> Seq(1.0f, 0.0f), 2L -> Seq(1.0f, 0.0f),
      3L -> Seq(1.0f, 0.0f))
    val batch = vecs(107L -> Seq(1.0f, 0.0f))
    val idx = Similarity.quantizedBandIndex(hist, "vec_id", "embedding")
      .filter(col("vec_id") <= 2L)
    val out = Similarity.incrementalKnn(idx, hist, batch, "vec_id",
      "embedding", k = 3).collect().map(_.getLong(2)).toSet
    // id 3's vector sits in the store but its index rows were dropped —
    // the operator must NOT re-bucket history to find it
    assert(out == Set(1L, 2L), out.toString)
  }

  test("bucketCap keeps the lowest-id residents only") {
    val hist = vecs((1L to 50L).map(i => i -> Seq(1.0f, 0.0f)): _*)
    val batch = vecs(107L -> Seq(1.0f, 0.0f))
    val idx = Similarity.quantizedBandIndex(hist, "vec_id", "embedding")
    val out = Similarity.incrementalKnn(idx, hist, batch, "vec_id",
      "embedding", k = 10, bucketCap = 2).collect().map(_.getLong(2)).toSet
    assert(out == Set(1L, 2L), out.toString)
  }
}
