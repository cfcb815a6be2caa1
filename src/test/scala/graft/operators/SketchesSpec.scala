package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the hand-rolled HLL sketch (the q45 gate mirrors its
  * registers in DuckDB; here we pin accuracy and branch behavior). */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def estimates(n: Int, grp: String = "g") = {
    import spark.implicits._
    val df = (0 until n).map(i => (grp, s"val_$i")).toDF("grp", "v")
    Sketches.hllDistinct(df, "grp", "v", b = 10).collect()(0)
  }

  test("hll large-range accuracy within 2σ (σ ≈ 1.04/√1024 ≈ 3.3%)") {
    for (n <- Seq(5000, 20000, 100000)) {
      val r = estimates(n)
      val est = r.getDouble(r.fieldIndex("estimate"))
      assert(math.abs(est - n) / n < 0.065,
        s"n=$n estimate=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("hll small-range branch (linear counting) is accurate and taken") {
    val r = estimates(300)
    val est = r.getDouble(r.fieldIndex("estimate"))
    val raw = r.getDouble(r.fieldIndex("est_raw"))
    assert(est != raw, "small cardinality must take the linear-counting branch")
    // LC σ at n=300, m=1024 is ≈2.3%; this fixed hash draw sits at 2.5σ
    assert(math.abs(est - 300) / 300 < 0.08, s"estimate=$est")
  }

  test("hll is deterministic and register state is bounded") {
    val a = estimates(10000)
    val b = estimates(10000)
    assert(a.getDecimal(a.fieldIndex("s_scaled")) ==
      b.getDecimal(b.fieldIndex("s_scaled")))
    assert(a.getLong(a.fieldIndex("n_present")) <= 1024L)
    // at n=10000 >> m=1024 essentially every register is hit
    assert(a.getLong(a.fieldIndex("n_present")) >= 1000L)
  }

  test("hll merges across partitions like a single-node sketch") {
    import spark.implicits._
    val df1 = (0 until 8000).map(i => ("g", s"val_$i")).toDF("grp", "v")
      .repartition(8)
    val df2 = (0 until 8000).map(i => ("g", s"val_$i")).toDF("grp", "v")
      .coalesce(1)
    val s1 = Sketches.hllDistinct(df1, "grp", "v").collect()(0)
    val s2 = Sketches.hllDistinct(df2, "grp", "v").collect()(0)
    assert(s1.getDecimal(s1.fieldIndex("s_scaled")) ==
      s2.getDecimal(s2.fieldIndex("s_scaled")),
      "register state must be partitioning-invariant")
  }
}
