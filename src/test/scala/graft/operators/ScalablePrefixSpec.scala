package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase distributed prefix sum vs the single-partition window
  * it replaces: identical results at every partition count, no Window
  * node in the physical plan, empty/edge frames handled. */
class ScalablePrefixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("matches the global-window cumulative at several partition counts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // keys deliberately unsorted + negative values; unique keys
    val rows = (0L until 999L).map(k => ((k * 131) % 997, (k % 23) - 7))
    val df = rows.toDF("k", "v")
    // GLOBAL-WINDOW: bounded — test-only reference computation
    val want = df.withColumn("run_sum",
        sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    for (n <- Seq(1, 3, 8, 64)) {
      val got = ScalablePrefix.cumSum(df, "k", "v", numPartitions = n)
        .orderBy("k").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"numPartitions=$n diverged from the window")
    }
  }

  test("empty and single-row frames") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(ScalablePrefix.cumSum(empty, "k", "v").count() == 0)
    val one = Seq((5L, 42L)).toDF("k", "v")
    val r = ScalablePrefix.cumSum(one, "k", "v").collect()
    assert(r.length == 1 && r(0).getLong(2) == 42L)
  }

  test("physical plan has NO Window node; stage 1 is a range exchange") {
    import spark.implicits._
    val df = (0L until 100L).map(k => (k, k)).toDF("k", "v")
    val out = ScalablePrefix.cumSum(df, "k", "v", numPartitions = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"prefix sum must not plan a WindowExec:\n$plan")
    // the localCheckpoint truncates lineage in the final plan, so pin
    // the range exchange on stage 1's own plan
    val stage1 = ScalablePrefix.ranged(df, "k", "v", 4)
      .queryExecution.executedPlan.toString
    assert(stage1.contains("rangepartitioning"),
      s"expected the range exchange in stage 1:\n$stage1")
  }
}
