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

  test("tie-safe variant matches the ROWS window over duplicate-heavy " +
    "keys at 1/8/64 partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // only 13 distinct order keys over 999 rows — every key is a heavy
    // tie; the unique row id breaks them. Negative values included.
    val rows = (0L until 999L).map(i => ((i * 131) % 13, i, (i % 23) - 7))
    val df = rows.toDF("k", "t", "v")
    // GLOBAL-WINDOW: bounded — test-only reference computation
    val want = df.withColumn("run_sum",
        sum(col("v")).over(Window.orderBy("k", "t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("k", "t").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    for (n <- Seq(1, 8, 64)) {
      val got = ScalablePrefix.cumSumTieSafe(df, "k", "t", "v",
          numPartitions = n)
        .orderBy("k", "t").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"numPartitions=$n diverged from the window")
    }
  }

  test("tie-safe plan has NO Window node") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i % 5, i, i)).toDF("k", "t", "v")
    val plan = ScalablePrefix.cumSumTieSafe(df, "k", "t", "v", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"tie-safe prefix sum must not plan a WindowExec:\n$plan")
  }

  test("rankedCumSum (string tie) matches row_number + ROWS window at " +
    "1/8/64 partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 7 distinct order keys over 500 rows, unique string ties
    val rows = (0 until 500).map(i => ((i * 37) % 7L, f"w${(i * 131) % 500}%03d", (i % 11).toLong))
    val df = rows.toDF("k", "t", "v")
    // GLOBAL-WINDOW: bounded — test-only reference computation
    val w = Window.orderBy("k", "t")
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("run_sum", sum(col("v")).over(w.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    for (n <- Seq(1, 8, 64)) {
      val got = ScalablePrefix.rankedCumSum(df, "k", "t", "v",
          numPartitions = n)
        .orderBy("k", "t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got == want, s"numPartitions=$n diverged from the window")
    }
  }

  test("migrated consumer: vocabCoverage plans NO WindowExec and is " +
    "hash-equal to the window spelling") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Zipf-ish toy corpus: 'the' dominates, long tail of uniques
    val docs = (0 until 120).map { i =>
      (i.toLong, ("the " * (1 + i % 3)) + s"w${i % 40} u$i")
    }.toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.vocabCoverage(docs, "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"migrated vocabCoverage must not plan a WindowExec:\n$plan")
    // the old spelling, reproduced verbatim as the parity reference
    val counts = docs.filter(trim(col("text")) =!= "")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    // GLOBAL-WINDOW: bounded — test-only reference computation
    val w = Window.orderBy(col("cnt").desc, col("word").asc)
    val ranked = counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(w.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)))
    val tot = counts.agg(sum(col("cnt")).as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    val want = ranked.crossJoin(broadcast(tot))
      .crossJoin(broadcast(Seq(50, 90, 99).toDF("target_pct")))
      .filter(col("cum") * 100 >= col("target_pct") * col("total_tokens"))
      .groupBy(col("target_pct").cast("long").as("target_pct"))
      .agg(min(col("vocab_size")).as("vocab_size"),
        min(col("total_tokens")).as("total_tokens"),
        min(col("rank")).as("types_needed"),
        min(col("cum")).as("cum_at"))
      .select(col("target_pct"), col("vocab_size"), col("total_tokens"),
        col("types_needed"),
        expr("""cast((cast(cum_at as decimal(38,0)) * 1000000)
                 div total_tokens as bigint)""").as("mass_micro"))
      .orderBy("target_pct").collect().map(_.toSeq).toSeq
    val got = out.orderBy("target_pct").collect().map(_.toSeq).toSeq
    assert(got == want, "migrated vocabCoverage diverged from the window spelling")
  }

  test("fractional order/tie columns are rejected loudly, not truncated") {
    import spark.implicits._
    val frac = Seq((1.5, 1L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ScalablePrefix.cumSum(frac, "k", "v")
    }
    assert(e.getMessage.contains("integral"))
    val fracTie = Seq((1L, 1.5, 1L)).toDF("k", "t", "v")
    val e2 = intercept[IllegalArgumentException] {
      ScalablePrefix.cumSumTieSafe(fracTie, "k", "t", "v")
    }
    assert(e2.getMessage.contains("integral"))
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
