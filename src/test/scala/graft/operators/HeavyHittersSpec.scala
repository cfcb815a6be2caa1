package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the count-min [[HeavyHitters]] aggregator: estimates
  * are exact when the sketch is wide enough, never underestimates even
  * when it is not, and the sketch is deterministic under repartitioning
  * (element-wise-add merge is commutative/associative). */
class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sample = {
    import spark.implicits._
    (Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ Seq.fill(7)("c") ++ Seq("d"))
      .toDF("k")
  }

  test("wide sketch: estimates equal exact counts") {
    val got = HeavyHitters.keyFrequencies(sample, "k", depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 100L, 100L), ("b", 40L, 40L), ("c", 7L, 7L),
      ("d", 1L, 1L)))
  }

  test("narrow sketch: estimates never underestimate") {
    val rows = HeavyHitters.keyFrequencies(sample, "k", depth = 2, width = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, exact, est) =>
      assert(est >= exact, s"key $k: est $est < exact $exact")
    }
  }

  test("sketch is invariant under repartitioning") {
    import spark.implicits._
    val agg = new HeavyHitters.CountMinAggregator(4, 1024, 42L)
    def sketchOf(parts: Int): Array[Long] =
      sample.repartition(parts).as[String].select(agg.toColumn).head()
    assert(sketchOf(1).toSeq == sketchOf(7).toSeq)
  }

  test("null keys are excluded, not crashed on") {
    import spark.implicits._
    val withNulls = (Seq("a", "a", null, "b", null): Seq[String]).toDF("k")
    val got = HeavyHitters.keyFrequencies(withNulls, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 2L), ("b", 1L, 1L)))
  }

  test("too many distinct keys is rejected, not silently truncated") {
    import spark.implicits._
    val many = (1 to 50).map(i => s"k$i").toDF("k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.keyFrequencies(many, "k", maxKeys = 10)
    }
    assert(e.getMessage.contains("distinct keys"))
  }
}
