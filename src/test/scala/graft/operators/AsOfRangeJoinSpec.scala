package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth semantics for [[AsOfJoin]] and [[RangeJoin]] on controlled
  * data: inclusive matching, inner drop of unmatched rows, per-key
  * isolation, boundary handling, and plan shape (no cartesian product). */
class AsOfRangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  private def leftDf = {
    import spark.implicits._
    Seq(
      ("a", 5L, 100),  // between refs at 3 and 7
      ("a", 7L, 101),  // exactly on ref 7 → inclusive
      ("a", 2L, 102),  // before first ref (3) → dropped backward
      ("b", 9L, 103),  // key isolation: only b refs qualify
      ("c", 4L, 104)   // key with no refs at all → dropped
    ).toDF("k", "ts", "lv")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      ("a", 3L, "r3"), ("a", 7L, "r7"), ("a", 11L, "r11"),
      ("b", 1L, "rb1"), ("b", 9L, "rb9")
    ).toDF("k", "rts", "rv")
  }

  test("backward as-of: greatest right ts <= left ts, inclusive, inner") {
    val got = AsOfJoin.backward(leftDf, rightDf, Seq("k"), "ts", "rts")
      .select("lv", "rv", "rts")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((100, "r3", 3L), (101, "r7", 7L), (103, "rb9", 9L)))
  }

  test("forward as-of: smallest right ts >= left ts, inclusive, inner") {
    val got = AsOfJoin.forward(leftDf, rightDf, Seq("k"), "ts", "rts")
      .select("lv", "rv", "rts")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // lv=102 (ts=2) now matches r3; lv=104 (key c) still has nothing
    assert(got == Set((100, "r7", 7L), (101, "r7", 7L), (102, "r3", 3L),
      (103, "rb9", 9L)))
  }

  test("null timestamps on either side never match") {
    import spark.implicits._
    val l = Seq(("a", Some(5L), 100), ("a", None, 101))
      .toDF("k", "ts", "lv")
    // the null right ts sorts first ascending; without the pre-filter it
    // would be carried forward into left rows that precede every real ref
    val r = Seq(("a", None, "rNull"), ("a", Some(7L), "r7"))
      .toDF("k", "rts", "rv")
    val back = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts")
      .select("lv", "rv").collect().map(x => (x.getInt(0), x.getString(1))).toSet
    assert(back.isEmpty, s"ts=5 has no ref <= 5 once null is excluded: $back")
    val fwd = AsOfJoin.forward(l, r, Seq("k"), "ts", "rts")
      .select("lv", "rv").collect().map(x => (x.getInt(0), x.getString(1))).toSet
    assert(fwd == Set(100 -> "r7"), "null left ts row must be dropped")
  }

  test("as-of rejects colliding right payload names") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(leftDf, rightDf.withColumnRenamed("rv", "lv"),
        Seq("k"), "ts", "rts")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("bucketed range join matches BETWEEN semantics incl. boundaries and overlaps") {
    import spark.implicits._
    val values = Seq(0.0, 9.99, 10.0, 10.01, 25.0, 50.0, 99.9).toDF("v")
    val intervals = Seq(
      ("lo", 0.0, 10.0),     // 10.0 inclusive on hi
      ("hi", 10.0, 100.0),   // 10.0 inclusive on lo → 10.0 matches both
      ("all", 0.0, 100.0)
    ).toDF("name", "lo", "hi")

    val got = RangeJoin.bucketed(values, intervals, "v", "lo", "hi", 7.0)
      .select("v", "name")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    val expect = (for {
      v <- Seq(0.0, 9.99, 10.0, 10.01, 25.0, 50.0, 99.9)
      (n, lo, hi) <- Seq(("lo", 0.0, 10.0), ("hi", 10.0, 100.0), ("all", 0.0, 100.0))
      if v >= lo && v <= hi
    } yield (v, n)).toSet
    assert(got == expect)
  }

  test("bucketed range join plans an equi-join, not a cartesian/BNLJ") {
    import spark.implicits._
    val values = spark.range(100).select((col("id") * 1.0).as("v"))
    val intervals = Seq(("x", 10.0, 20.0)).toDF("name", "lo", "hi")
    val plan = RangeJoin.bucketed(values, intervals, "v", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("last-touch window filters AFTER the as-of pick (q59 semantics)") {
    import spark.implicits._
    // user 1: stale latest click at 200 — the purchase at 300 must NOT
    // fall back to the older click at 100; it attributes to nothing.
    // user 2: in-window latest click attributes normally.
    val clicks = Seq((1L, 100L, 7L), (1L, 200L, 8L), (2L, 280L, 9L))
      .toDF("user_id", "click_ts", "campaign")
    val purchases = Seq((10L, 1L, 300L), (20L, 2L, 300L))
      .toDF("event_id", "user_id", "ts_us")
    val out = AsOfJoin.backward(purchases, clicks, Seq("user_id"),
        "ts_us", "click_ts")
      .filter(col("ts_us") - col("click_ts") <= 50L)
      .select("event_id", "campaign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(20L -> 9L), out.toString)
  }
}
