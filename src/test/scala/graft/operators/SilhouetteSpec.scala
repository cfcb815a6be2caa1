package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Simplified silhouette (s14): assignment, tie-break, and the scaled
  * score must match the hand computation. */
class SilhouetteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("scores, assignment tie-break, and cluster rollup are exact") {
    import spark.implicits._
    // scale 1024: quantized points (0,0) (1024,0) (256,0) (512,0)
    val pts = Seq(
      (10L, Seq(0.0f, 0.0f)),   // on c0 → sil 1e6
      (11L, Seq(1.0f, 0.0f)),   // on c1 → sil 1e6
      (12L, Seq(0.25f, 0.0f)),  // a²=65536, b²=589824 → 888888 (trunc)
      (13L, Seq(0.5f, 0.0f)))   // equidistant → lower cid 0, sil 0
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.clusterSilhouette(pts, "vec_id", "embedding",
      cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // cluster 0: p10 (1e6) + p12 (888888) + p13 (0) → avg 629629 trunc
    assert(out(0L) == (3L, 1888888L, 629629L), out.toString)
    assert(out(1L) == (1L, 1000000L, 1000000L), out.toString)
  }

  test("a point identical to two centroids scores 0, not null") {
    import spark.implicits._
    val pts = Seq((5L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.clusterSilhouette(pts, "vec_id", "embedding",
      cents, "vec_id", "embedding").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(2) == 0L,
      out.head.toString)
  }
}
