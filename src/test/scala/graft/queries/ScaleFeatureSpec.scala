package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-filtering features that only pay off at scale: row-level Bloom
  * filter injection and dynamic partition pruning. Neither changes query
  * results, so they are pinned as plan/behavior properties here rather
  * than as oracle gates. */
class ScaleFeatureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // thresholds low enough that the sf0.001 tables qualify for injection
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    // default application-side threshold is 10GB — the feature is sized
    // for exactly the 100 TB regime; drop it so sf0.001 demonstrates it
    .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    .config("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("selective join injects a runtime Bloom filter on the probe side") {
    // a selective filter on orders should seed a bloom filter that prunes
    // lineitem rows BEFORE the join shuffle — at 100 TB this is the
    // difference between shuffling the full fact table and a sliver of it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 200000.0)
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
        plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one key holds ~99% of the rows — the exact shape that stalls a
    // 1000-executor shuffle join on a single straggler task. With the
    // skew-join thresholds scaled down to test size, AQE must mark the
    // sort-merge join as skew=true and split the hot partition.
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = (0 until 20000).map(i =>
        (if (i % 100 == 0) (i % 7).toLong + 1 else 0L, s"pad-left-$i"))
        .toDF("k", "l_pad")
      val right = (0L until 8L).map(k => (k, s"dim-$k")).toDF("k", "r_pad")
      val joined = left.join(right, "k")
      // execute THIS queryExecution so its adaptive plan is final
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join handling in:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning prunes fact partitions through the join") {
    val base = Files.createTempDirectory("graft_dpp").toFile
    try {
      // fact partitioned by month; dimension filter selects one month
      spark.read.parquet(s"$dir/orders.parquet")
        .withColumn("omonth", month(col("o_orderdate")))
        .write.partitionBy("omonth").mode("overwrite")
        .parquet(s"$base/orders_part")
      val fact = spark.read.parquet(s"$base/orders_part")
      // the dim must be OPAQUE (parquet-backed): a literal-derived dim
      // constant-folds through the join into a static partition filter —
      // correct, but then there is nothing dynamic left to prune. And the
      // dim-side predicate must be a "likely selective" SHAPE (equality /
      // IN / LIKE on an attribute): a bare boolean column fails the DPP
      // heuristic even though it is just as selective.
      spark.range(1, 13).select(col("id").cast("int").as("m"),
          when(col("id") === 3, "pick").otherwise("skip").as("tag"))
        .write.mode("overwrite").parquet(s"$base/dim")
      val dim = spark.read.parquet(s"$base/dim")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      val joined = fact.join(dim, fact("omonth") === dim("m"))
        .filter(col("tag") === "pick")
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dynamicpruning"),
        s"expected dynamic partition pruning in:\n$optimized")
      assert(joined.collect()(0).getLong(0) > 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(base)
    }
  }
}
