package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** KLL-style derandomized quantile sketch (q53): levels are a pure
  * function of the key, per-slice sketches merge EXACTLY to the direct
  * sketch, and rank error stays inside the capacity bound. */
class QuantileSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("levels are geometrically distributed and partitioning-invariant") {
    import spark.implicits._
    val n = 20000
    val lv = (0 until n).map(_.toLong).toDF("key")
      .select(QuantileSketch.levelOf(col("key")).as("lvl"))
      .groupBy("lvl").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val atLeast1 = lv.filter(_._1 >= 1).values.sum.toDouble / n
    val atLeast3 = lv.filter(_._1 >= 3).values.sum.toDouble / n
    // P(lvl >= t) = 2^-t over the FNV hash family
    assert(math.abs(atLeast1 - 0.5) < 0.02, s"P(lvl>=1) = $atLeast1")
    assert(math.abs(atLeast3 - 0.125) < 0.02, s"P(lvl>=3) = $atLeast3")
    // repartitioned input produces identical level counts (pure function)
    val lv8 = (0 until n).map(_.toLong).toDF("key").repartition(8)
      .select(QuantileSketch.levelOf(col("key")).as("lvl"))
      .groupBy("lvl").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(lv8 == lv)
  }

  test("merged per-slice sketches equal the direct sketch exactly") {
    import spark.implicits._
    // a slicing unrelated to the q53 gate's: 7 slices by key mod 7,
    // skewed sizes via a second filter
    val rows = (0 until 30000).map { i =>
      (i.toLong, (i % 7).toString, (i * i % 9973).toLong)
    }.toDF("key", "slice", "value")
    val cap = 512
    val lvls = QuantileSketch.withLevels(rows, col("slice"), col("key"),
      col("value"))
    val lc = QuantileSketch.levelCounts(lvls).cache()
    val tSlice = QuantileSketch.thresholds(lc, cap)
    val kept = lvls.join(broadcast(tSlice), "slice")
      .filter(col("lvl") >= col("t_slice"))
    val tFloor = tSlice.agg(max(col("t_slice")).as("tf"))
    val mergedLc = kept.groupBy("lvl").agg(count(lit(1)).as("cnt"))
      .withColumn("slice", lit("all"))
    val tM = QuantileSketch.thresholds(mergedLc, cap, floor = Some(tFloor))
      .collect().head.getInt(1)
    // direct: one-shot global sketch over the same rows
    val gLvls = QuantileSketch.withLevels(rows, lit("all"), col("key"),
      col("value"))
    val gLc = QuantileSketch.levelCounts(gLvls)
    val tD = QuantileSketch.thresholds(gLc, cap).collect().head.getInt(1)
    assert(tM == tD, s"merged threshold $tM != direct $tD")
    val mergedKeys = kept.filter(col("lvl") >= tM)
      .select("key").collect().map(_.getLong(0)).toSet
    val directKeys = gLvls.filter(col("lvl") >= tD)
      .select("key").collect().map(_.getLong(0)).toSet
    assert(mergedKeys == directKeys,
      s"merged kept-set differs from direct (sizes ${mergedKeys.size} vs ${directKeys.size})")
  }

  test("rank error stays within the capacity bound on skewed data") {
    import spark.implicits._
    // heavy-tailed values (quadratic growth) — the regime where q52's
    // equi-width buckets fail but rank accuracy must hold
    val n = 50000
    val rows = (0 until n).map(i => (i.toLong, "s", (i.toLong * i))).toDF(
      "key", "slice", "value")
    val cap = 1024
    val lvls = QuantileSketch.withLevels(rows, col("slice"), col("key"),
      col("value"))
    val lc = QuantileSketch.levelCounts(lvls)
    val th = QuantileSketch.thresholds(lc, cap)
    val kept = lvls.join(broadcast(th), "slice")
      .filter(col("lvl") >= col("t_slice"))
      .select(col("key"), col("value"), col("lvl"))
    val tM = th.select(col("t_slice").cast("long").as("t_m"))
    val nTot = lvls.agg(count(lit(1)).as("n_total"))
    val est = QuantileSketch.estQuantiles(kept, tM, nTot,
      Seq(100L, 500L, 900L))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    est.foreach { case (pm, v) =>
      // value i*i has exact rank i+1: invert to check the rank error
      val trueRank = math.floor(math.sqrt(v.toDouble)).toLong + 1
      val target = (n * pm + 999) / 1000
      assert(math.abs(trueRank - target) * 20 <= n,
        s"p=$pm est=$v rank=$trueRank target=$target off by more than 5%")
    }
  }

  test("q53 gate audit booleans hold at sf0.001") {
    val out = graft.SparkEntry.queries("q53_kll_quantiles")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Boolean]("rank_err_ok"), r.toString)
      assert(r.getAs[Boolean]("merge_exact"), r.toString)
    }
  }
}
