package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: persisting both sides bucketed on the
  * join key removes the per-query shuffle entirely — the pattern a 100 TB
  * deployment uses for its hottest repeated join (e.g. orders ⋈ lineitem
  * every query). The spec proves the Exchange disappears from the plan. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toFile

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse.getAbsolutePath)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed orders ⋈ lineitem joins with zero Exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        spark.table("orders_b")("o_orderkey") === spark.table("lineitem_b")("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    // and it returns the same count as the shuffled join
    assert(joined.count() ==
      orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey")).count())
  }
}
