package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN ground truth (s09): the column-expression
  * encoder must agree with an independent driver-side replay, and the
  * result must be partitioning-invariant. */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("pq codes replay on the driver; top-k is partitioning-invariant") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = Similarity.vectorOf(spark, dir, 0L)
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", 8, 16)
    val dsub = q.length / 8
    val qq = q.map(x => math.floor(x * 128d).toLong)
    val qdist = Array.tabulate(8, 16) { (mi, c) =>
      var s = 0L; var j = 0
      while (j < dsub) {
        val d = qq(mi * dsub + j) - cb(mi)(c)(j); s += d * d; j += 1
      }
      s
    }

    val out = Similarity.pqTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 10)
    out.foreach { case (_, code, approx) =>
      val codes = (0 until 8).map(mi => ((code >> (4 * mi)) & 0xfL).toInt)
      assert(codes.forall(c => c >= 0 && c < 16))
      // ADC replay: the packed codes fully determine the approx distance
      assert(codes.zipWithIndex.map { case (c, mi) => qdist(mi)(c) }.sum
        == approx)
    }

    val repart = Similarity.pqTopK(emb.repartition(7), "vec_id",
      "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(repart.toSeq == out.toSeq)

    // the query vector itself (vec_id 0) must reconstruct losslessly to
    // its own codebook distances — i.e. its ADC distance is the minimum
    // over its own code cells, and it appears in the top-k
    assert(out.exists(_._1 == 0L))
  }

  test("ivfPqTopKWith: two probes over PREBUILT artifacts equal the " +
    "per-call-trained path and plan zero training jobs") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .localCheckpoint() // isolate job counting from the parquet read
    val q1 = Similarity.vectorOf(spark, dir, 0L)
    val q2 = Similarity.vectorOf(spark, dir, 7L)
    // train ONCE — both artifacts are query-independent by construction
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 2, 64)
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", 8, 16)
    // building the probe plans must launch NO Spark jobs (training was
    // the only action; the probe itself is a lazy map-only plan)
    val sc = spark.sparkContext
    sc.setJobGroup("ivfpq-with", "probe planning", false)
    val p1 = Similarity.ivfPqTopKWith(emb, "vec_id", "embedding",
      centroids, cb, q1, 5, 2, 4)
    val p2 = Similarity.ivfPqTopKWith(emb, "vec_id", "embedding",
      centroids, cb, q2, 5, 2, 4)
    sc.clearJobGroup()
    Thread.sleep(100)
    assert(sc.statusTracker.getJobIdsForGroup("ivfpq-with").isEmpty,
      "prebuilt-artifact probes must not retrain (no jobs at plan time)")
    // and each probe's rows equal the train-per-call entry point's
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(p1) == rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q1, 5, nlist = 8, nprobe = 2, m = 8, ksub = 16, refine = 4,
      lloydIters = 2, trainFactor = 64)))
    assert(rows(p2) == rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q2, 5, nlist = 8, nprobe = 2, m = 8, ksub = 16, refine = 4,
      lloydIters = 2, trainFactor = 64)))
    // reordered centroids violate the id==index invariant loudly
    assertThrows[IllegalArgumentException] {
      Similarity.ivfPqTopKWith(emb, "vec_id", "embedding",
        centroids.reverse, cb, q1, 5, 2, 4)
    }
  }

  test("edge guards: indivisible dims, tiny corpus, empty corpus fail loudly") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = Similarity.vectorOf(spark, dir, 0L)
    // query dim not divisible by m would silently drop trailing dims
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, "vec_id", "embedding", q.take(63), 10)
    }
    // corpus smaller than ksub cannot seed a full codebook
    val tiny = emb.limit(5)
    val eTiny = intercept[IllegalArgumentException] {
      Similarity.pqTopK(tiny, "vec_id", "embedding", q, 3)
    }
    assert(eTiny.getMessage.contains("ksub"))
    // empty corpus: a clear require, not an NPE
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb.limit(0), "vec_id", "embedding", q, 3)
    }
  }
}
