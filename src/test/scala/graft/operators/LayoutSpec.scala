package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: key arithmetic ground truth + the actual layout
  * property (tight per-partition bounding boxes in every clustered
  * dimension, which is what enables multi-column min/max data skipping). */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("zorderKey interleaves bits (known vectors)") {
    import spark.implicits._
    val out = Seq((3L, 0L), (0L, 3L), (1L, 1L), (2L, 3L))
      .toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    // dim 0 bit i -> out bit 2i; dim 1 bit i -> out bit 2i+1
    assert(out.toSeq == Seq(
      5L,  // x=0b11 -> bits 0,2
      10L, // y=0b11 -> bits 1,3
      3L,  // x bit0 + y bit1
      14L  // x=0b10 -> bit 2; y=0b11 -> bits 1,3
    ))
  }

  test("zorderKeySql mirrors zorderKey") {
    import spark.implicits._
    val df = spark.range(500).select(
      (col("id") * 37 % 64).as("x"), (col("id") * 53 % 64).as("y"))
    val viaSql = df.selectExpr(
      s"(${Layout.zorderKeySql(Seq("x", "y"), bits = 6)}) AS z")
    val viaCol = df.select(Layout.zorderKey(Seq(col("x"), col("y")), 6).as("z"))
    assert(viaSql.collect().map(_.getLong(0)).toSeq ==
      viaCol.collect().map(_.getLong(0)).toSeq)
  }

  test("z-order layout keeps both dimensions tight per partition") {
    import spark.implicits._
    // 64x64 grid, one row per cell — any layout must spread 4096 cells
    // over 16 partitions; z-order should bound BOTH x and y ranges per
    // partition, while the linear (sort by x) layout leaves y unbounded
    val grid = spark.range(4096).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    def avgYRange(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("y") - min("y")).as("yr"))
        .agg(avg("yr")).collect()(0).getDouble(0)
      r
    }
    val z = Layout.clusterByZOrder(grid, Seq(col("x"), col("y")),
      bits = 6, numPartitions = 16)
    val linear = grid.repartitionByRange(16, col("x"))
    val zy = avgYRange(z)
    val ly = avgYRange(linear)
    // z-order: each partition is ~a 16x16-ish tile => y-range ~16-32;
    // linear-by-x: each partition spans all 64 y values
    assert(zy < 40, s"z-order avg y-range $zy should be tile-bounded")
    assert(ly > 60, s"linear layout should span y fully, got $ly")
    assert(zy < ly / 2)
  }

  test("rendezvousShard: uniform split, minimal disruption on growth, " +
    "no inter-old-shard moves") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("doc_id")
    val a8 = Layout.rendezvousShard(keys, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a9 = Layout.rendezvousShard(keys, "doc_id", 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a8.size == 2000 && a8.values.forall(s => s >= 0 && s < 8))
    // roughly uniform: every shard within 2x of fair share
    val hist = a8.values.groupBy(identity).view.mapValues(_.size)
    assert(hist.values.forall(n => n > 125 && n < 500), hist.toMap.toString)
    // growth moves ONLY into the new shard, ~1/9 of keys
    val moved = a8.keys.filter(k => a8(k) != a9(k)).toSeq
    assert(moved.forall(k => a9(k) == 8L),
      s"illegal inter-old-shard moves: ${moved.filter(a9(_) != 8L).take(5)}")
    assert(moved.size > 2000 / 18 && moved.size < 2000 / 4,
      s"moved ${moved.size}, expected ≈ ${2000 / 9}")
  }

  test("rendezvousShard: string keys shard under their own name and type") {
    import spark.implicits._
    // pre-r14 the output cast string ids to long → every UUID became a
    // NULL id on one degenerate shard; keys now pass through untouched
    val keys = (0 until 1000).map(i => s"doc-$i-uuid").toDF("url")
    val out = Layout.rendezvousShard(keys, "url", 8)
    assert(out.schema.fieldNames.toSeq == Seq("url", "shard"))
    assert(out.schema("url").dataType ==
      org.apache.spark.sql.types.StringType)
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 1000 && rows.keys.forall(_ != null))
    val hist = rows.values.groupBy(identity).view.mapValues(_.size)
    assert(hist.size == 8 && hist.values.forall(n => n > 50 && n < 300),
      hist.toMap.toString)
  }

  test("temperatureMixture: sqrt damping, max source pinned to 1.0") {
    import spark.implicits._
    val df = Seq(("a", 60L), ("a", 40L), ("b", 25L), ("c", 0L))
      .toDF("source", "toks")
    val out = Layout.temperatureMixture(df, "source", col("toks"))
      .orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: 100 tokens -> weight 1.0; b: 25 -> sqrt(25)/sqrt(100) = 0.5
    // (100x fewer tokens would mean only 10x less sampling); c: 0 -> 0.0
    assert(out.toSeq == Seq(
      ("a", 2L, 100L, 1000000L), ("b", 1L, 25L, 500000L),
      ("c", 1L, 0L, 0L)))
  }

  test("budgetSelect matches the naive global prefix-sum rule, " +
    "including boundary-bucket splits and zero-token rows") {
    import spark.implicits._
    // quality classes {0.9, 0.5, 0.1}; ids interleaved so class 0.5
    // spans several width-2 buckets and the cut lands mid-bucket
    val rows = Seq(
      (0L, 0.9, 10L), (1L, 0.5, 4L), (2L, 0.5, 4L), (3L, 0.5, 0L),
      (4L, 0.5, 4L), (5L, 0.5, 4L), (6L, 0.1, 50L), (7L, 0.9, 10L))
    val df = rows.toDF("id", "q", "toks")
    def naive(budget: Long): Set[Long] = {
      var cum = 0L
      rows.sortBy { case (id, q, _) => (-q, id) }.flatMap {
        case (id, _, t) =>
          cum += t; if (cum <= budget) Some(id) else None
      }.toSet
    }
    for (budget <- Seq(0L, 10L, 24L, 29L, 33L, 86L, 1000L)) {
      val got = Layout.budgetSelect(df, "id", col("q"), col("toks"),
          lit(budget), bucketWidth = 2L)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == naive(budget), s"budget=$budget: $got vs ${naive(budget)}")
    }
  }
}
