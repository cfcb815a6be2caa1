package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-dimension embedding drift (s11): planted mean shifts must flag
  * exactly the shifted dimensions, in exact integers. */
class EmbeddingDriftSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("flags exactly the dimensions with a planted mean shift") {
    import spark.implicits._
    // 8-dim vectors; slice B shifts dim 2 by +0.05 and dim 5 by -0.01,
    // both far beyond the 0.005 threshold; other dims identical
    def vec(i: Int, shift2: Double, shift5: Double): Array[Float] =
      Array.tabulate(8) { d =>
        val base = math.sin(i * 13 + d).toFloat * 0.3f
        d match {
          case 2 => base + shift2.toFloat
          case 5 => base + shift5.toFloat
          case _ => base
        }
      }
    val a = (0 until 400).map(i => Tuple1(vec(i, 0, 0))).toDF("embedding")
    val b = (0 until 300).map(i => Tuple1(vec(i, 0.05, -0.01))).toDF("embedding")
    val out = Embeddings.driftStats(a, b, "embedding").collect()
    assert(out.length == 8)
    val drifted = out.filter(_.getBoolean(7)).map(_.getInt(0)).toSet
    assert(drifted == Set(2, 5), s"drifted dims: $drifted")
    // counts exact
    out.foreach { r =>
      assert(r.getLong(1) == 400L && r.getLong(4) == 300L)
    }
  }

  test("identical slices never drift; moments merge by addition") {
    import spark.implicits._
    val rows = (0 until 200).map(i =>
      Tuple1(Array.tabulate(4)(d => (i * 31 + d).toFloat / 997f)))
    val df = rows.toDF("embedding")
    val out = Embeddings.driftStats(df, df, "embedding").collect()
    assert(out.forall(!_.getBoolean(7)))
    // same slice → identical exact moments on both sides
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(5) && r.getLong(3) == r.getLong(6))
    }
  }
}
