package graft.sources.excel

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AQE composition over excel-sourced relations (VERDICT r12 item 7).
  *
  * The measured contract, pinned both ways: AQE's skew-join splitting
  * subdivides a skewed REDUCE partition at map-output granularity, so it
  * can only fire if the scan feeding the shuffle ran as multiple map
  * tasks. A single xlsx read as one partition leaves one map output
  * block per reduce partition — indivisible, no split, regardless of how
  * skewed the join key is. With the connector's `maxRowsPerPartition`
  * row-range splits the same workbook becomes many map tasks and the
  * identical join gets `skew=true` sub-partitions. At 100 TB this makes
  * scan-side parallelism a PRECONDITION for AQE skew rescue — which the
  * excel source provides (1 file = 1 partition + row-range splits), not
  * an orthogonal nicety. BASELINE.md §AQE records the A/B. */
class ExcelAqeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val xlsx: String = {
    val base = new File(System.getProperty("java.io.tmpdir"),
      "graft_excel_aqe_skew")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(base)
    // heavily skewed join key: ~29k rows on key 0, a handful elsewhere
    spark.range(30000)
      .select(when(col("id") < 29000, lit(0L)).otherwise(col("id") % 97)
        .as("k"), col("id").as("payload"))
      .coalesce(1).write.format("excel").mode("overwrite")
      .save(new File(base, "left.xlsx").getAbsolutePath)
    new File(base, "left.xlsx").getAbsolutePath
  }

  private def runJoin(rowRangeSplits: Boolean): String = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    ss.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // force a sort-merge join: skew splitting is an SMJ/SHJ optimization
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    var reader = ss.read.format("excel").schema("k LONG, payload LONG")
    if (rowRangeSplits) reader = reader.option("maxRowsPerPartition", "2000")
    val left: DataFrame = reader.load(xlsx)
    // one row per key: no join explosion — the skew under test is the
    // left shuffle partition carrying key 0
    val right = ss.range(97).select(col("id").as("k"), (col("id") * 3).as("r"))
    val joined = left.join(right, "k")
    assert(joined.collect().length == 30000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    plan
  }

  test("row-range-split excel scan: AQE splits the skewed join partition") {
    val plan = runJoin(rowRangeSplits = true)
    assert(plan.contains("skew=true"),
      s"AQE must split the skewed shuffle partition:\n${plan.take(2000)}")
    assert(plan.contains("AQEShuffleRead skewed"), plan.take(2000))
  }

  test("single-mapper excel scan: indivisible map block, no skew split") {
    val plan = runJoin(rowRangeSplits = false)
    assert(!plan.contains("skew=true"),
      "a 1-map-task scan has nothing AQE can subdivide — if this starts " +
        s"passing, the engine changed and BASELINE.md §AQE is stale:\n" +
        plan.take(2000))
  }
}
