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

  test("MAX-merged registers of disjoint slices equal the direct union sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two overlapping slices: union has 12000 distincts, each slice 8000
    val a = (0 until 8000).map(i => ("a", s"val_$i")).toDF("grp", "v")
    val b = (4000 until 12000).map(i => ("b", s"val_$i")).toDF("grp", "v")
    val perSlice = Sketches.hllRegisters(a.union(b), "grp", "v")
    val merged = perSlice.groupBy(col("bucket"))
      .agg(max(col("mrho")).as("mrho"))
      .withColumn("grp", lit("u"))
    val direct = Sketches.hllRegisters(
      a.union(b).withColumn("grp", lit("u")), "grp", "v")
    val est = (df: org.apache.spark.sql.DataFrame) =>
      Sketches.hllFromRegisters(df, "grp").collect()(0)
    val (me, de) = (est(merged), est(direct))
    assert(me.getDecimal(me.fieldIndex("s_scaled")) ==
      de.getDecimal(de.fieldIndex("s_scaled")),
      "merged register state must equal the direct union sketch's")
    assert(me.getLong(me.fieldIndex("est_micro")) ==
      de.getLong(de.fieldIndex("est_micro")))
  }

  test("est_micro is the truncated integer image of est_raw") {
    for (n <- Seq(300, 5000, 20000, 100000)) {
      val r = estimates(n)
      val raw = r.getDouble(r.fieldIndex("est_raw"))
      val micro = r.getLong(r.fieldIndex("est_micro"))
      // integer path truncates at the micro digit; float path rounds at
      // ~1e-15 relative — they agree to one micro-unit plus float slack
      assert(math.abs(raw - micro / 1e6) <= 1e-6 + raw * 1e-12,
        s"n=$n est_raw=$raw est_micro=$micro")
    }
  }

  test("small_range agrees with the branch the float estimate took") {
    for (n <- Seq(100, 300, 1000, 5000, 20000)) {
      val r = estimates(n)
      val smallRange = r.getInt(r.fieldIndex("small_range"))
      val tookLc = r.getDouble(r.fieldIndex("estimate")) !=
        math.rint(r.getDouble(r.fieldIndex("est_raw")) * 1e4) / 1e4
      assert((smallRange == 1) == tookLc,
        s"n=$n small_range=$smallRange but LC-branch=$tookLc")
    }
  }

  test("kmv: exact below k, within 4σ above k, estimate monotone-sane") {
    import spark.implicits._
    // n ≤ k → the sketch IS the distinct set and the estimate is exact
    val small = (0 until 100).map(i => ("g", s"v_$i")).toDF("grp", "v")
    val rs = Sketches.kmvBottomK(small, "grp", "v", k = 256).collect()(0)
    assert(rs.getLong(rs.fieldIndex("n_exact")) == 100)
    assert(rs.getSeq[Long](rs.fieldIndex("bottom_k")).size == 100)
    assert(rs.getDouble(rs.fieldIndex("kmv_est")) == 100.0)
    // n >> k → (k-1)/u estimate within 4σ (σ ≈ 1/√(k−2) ≈ 6.3%)
    for (n <- Seq(5000, 50000)) {
      val df = (0 until n).map(i => ("g", s"v_$i")).toDF("grp", "v")
      val r = Sketches.kmvBottomK(df, "grp", "v", k = 256).collect()(0)
      val est = r.getDouble(r.fieldIndex("kmv_est"))
      assert(r.getSeq[Long](r.fieldIndex("bottom_k")).size == 256)
      assert(math.abs(est - n) / n < 0.25, s"n=$n est=$est")
    }
  }

  test("kmv merge: k smallest of unioned sketches == sketch of the union") {
    import spark.implicits._
    val k = 64
    // two overlapping slices of one population
    val df = (0 until 3000).map { i =>
      (if (i % 2 == 0 || i % 3 == 0) "a" else "b", s"v_$i")
    }.toDF("grp", "v")
    val perSlice = Sketches.kmvBottomK(df, "grp", "v", k).collect()
    val mergedBottom = perSlice
      .flatMap(_.getSeq[Long](perSlice.head.fieldIndex("bottom_k")))
      .distinct.sorted.take(k).toSeq
    val direct = Sketches.kmvBottomK(
      df.select(org.apache.spark.sql.functions.lit("all").as("grp"),
        org.apache.spark.sql.functions.col("v")), "grp", "v", k)
      .collect()(0)
    assert(direct.getSeq[Long](direct.fieldIndex("bottom_k")) == mergedBottom,
      "merging per-slice bottom-k sets must reproduce the union's bottom-k")
  }

  test("b >= 12 propagates NULL to est_micro AND small_range") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ("g", s"val_$i")).toDF("grp", "v")
    val r = Sketches.hllDistinct(df, "grp", "v", b = 12).collect()(0)
    assert(r.isNullAt(r.fieldIndex("est_micro")),
      "numerator exceeds DECIMAL(38,0) at b=12 — est_micro must be NULL")
    assert(r.isNullAt(r.fieldIndex("small_range")),
      "branch was never decided — small_range must not claim harmonic")
    // the float surface is still live at any b
    assert(r.getDouble(r.fieldIndex("estimate")) > 0)
  }

  test("q60 rolling merge: window estimate dominates every member day " +
    "and the small-range flag fires at fixture cardinality") {
    val out = graft.queries.StatQueries.q60RollingHll(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // registers only gain mass under MAX-merge → n_present ≤ m, and at
      // ~150 users the linear-counting branch must be flagged
      assert(r.getLong(1) <= 1024, r.toString)
      assert(r.getInt(5) == 1, s"small_range must fire: $r")
      assert(r.getLong(6) > 0, r.toString)
    }
    // union dominance: the window sketch of any day must carry at least
    // as many occupied registers as that day's own sketch
    import org.apache.spark.sql.functions._
    val ev = graft.queries.EventTime.load(spark, "/root/testdata/sf0.001")
      .select(to_date(col("ts_t")).as("day"), col("user_id"))
    val dailyN = Sketches.hllRegisters(ev, "day", "user_id")
      .groupBy("day").agg(count(lit(1)).as("n1"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) >= dailyN(r.getDate(0).toString),
        s"window sketch lost registers vs its own day: $r")
    }
  }
}
