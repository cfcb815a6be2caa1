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

  test("d19's fingerprint store probed bucketed: store side never re-shuffles") {
    // the incremental-dedup scale claim made concrete: the HISTORICAL
    // fingerprint store persists bucketed by fp, so each day's batch
    // probe shuffles ONLY the new batch — the store (the 100 TB side)
    // reads in place, every day, forever
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      .select(md5(col("text").cast("binary")).as("fp"))
      .distinct()
      .write.bucketBy(8, "fp").sortBy("fp")
      .mode("overwrite").saveAsTable("fp_store")
    val batch = d.filter(pmod(col("doc_id"), lit(10)) === 7)
      .withColumn("fp", md5(col("text").cast("binary")))
    val probe = batch.join(spark.table("fp_store"), Seq("fp"), "left_semi")
    val plan = probe.queryExecution.executedPlan.toString
    // exactly one Exchange: the batch re-partitioning to the store's
    // bucketing; a second would mean the store itself shuffled
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"store side must not shuffle:\n$plan")
    // same result as the unbucketed probe (and the batch itself is real)
    val unbucketed = batch.join(
      d.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        .select(md5(col("text").cast("binary")).as("fp")).distinct(),
      Seq("fp"), "left_semi")
    assert(batch.count() > 0 && probe.count() == unbucketed.count())
  }
}
