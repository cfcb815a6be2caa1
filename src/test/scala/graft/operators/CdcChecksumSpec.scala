package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the p13/p14/p15 operators: CDC compaction picks
  * the highest-seq event and honors tombstones; the dataset checksum is
  * layout-invariant and duplicate-sensitive; incremental state merge
  * equals recompute for decomposable aggregates. */
class CdcChecksumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("latestSnapshot: max-seq wins, deletes tombstone, inserts survive") {
    import spark.implicits._
    val log = Seq(
      (1L, "I", 1L, 10.0), (1L, "U", 2L, 11.0), (1L, "U", 3L, 12.0),
      (2L, "I", 1L, 20.0), (2L, "D", 2L, -1.0),
      (3L, "I", 5L, 30.0),
      (4L, "I", 1L, 40.0), (4L, "D", 2L, -1.0), (4L, "I", 3L, 41.0)
    ).toDF("k", "op", "seq", "price")
    val snap = Cdc.latestSnapshot(log, "k", "seq", "op", "price")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // key 1: last update wins; key 2: tombstoned; key 3: lone insert;
    // key 4: re-inserted after a delete
    assert(snap == Seq((1L, 12.0, 3L), (3L, 30.0, 5L), (4L, 41.0, 3L)))
  }

  test("latestSnapshot plan: aggregation, not a window sort") {
    import spark.implicits._
    val log = Seq((1L, "I", 1L, 1.0)).toDF("k", "op", "seq", "price")
    val plan = Cdc.latestSnapshot(log, "k", "seq", "op", "price")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"compaction must not window-sort:\n$plan")
    assert(plan.contains("Aggregate"), plan)
  }

  test("datasetChecksum is partitioning- and order-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"src${i % 3}", i.toLong, s"text $i"))
    val a = rows.toDF("src", "id", "text")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(a.collect().reverse.toSeq, 9), a.schema)
    def stamp(df: org.apache.spark.sql.DataFrame) =
      Checksum.datasetChecksum(df, "src", Seq("id", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    assert(stamp(a) == stamp(b.repartition(7)))
  }

  test("datasetChecksum catches single-char edits AND duplicated pairs") {
    import spark.implicits._
    val base = (1 to 100).map(i => ("s", i.toLong, s"text $i"))
    def stamp(rows: Seq[(String, Long, String)]) =
      Checksum.datasetChecksum(rows.toDF("src", "id", "text"),
        "src", Seq("id", "text"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val clean = stamp(base)
    val edited = stamp(base.updated(41, ("s", 42L, "text 42x")))
    assert(clean != edited, "one-char edit must change the stamp")
    // duplicating one row flips nothing in XOR-of-pair terms for the
    // duplicated pair — count and the additive digest must still move
    val duped = stamp(base ++ Seq(base(7), base(7)))
    assert(duped._1 == clean._1 + 2 && duped._2 == clean._2 &&
      duped._3 != clean._3,
      s"additive digest must catch duplicated pairs: $clean vs $duped")
  }

  test("mergeState: sum/min/max merge, lone-side keys pass through") {
    import spark.implicits._
    val state = Seq((1L, 3L, 30.0, 2L, 9L), (2L, 1L, 5.0, 7L, 7L))
      .toDF("k", "n", "s", "mn", "mx")
    val delta = Seq((1L, 2L, 12.0, 1L, 4L), (3L, 4L, 8.0, 0L, 0L))
      .toDF("k", "n", "s", "mn", "mx")
    val merged = Incremental.mergeState(state, delta, Seq("k"),
      sumCols = Seq("n", "s"), minCols = Seq("mn"), maxCols = Seq("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(merged == Seq(
      (1L, 5L, 42.0, 1L, 9L), // both sides merge
      (2L, 1L, 5.0, 7L, 7L),  // state-only key unchanged
      (3L, 4L, 8.0, 0L, 0L))) // brand-new key adopted as-is
  }

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    import spark.implicits._
    val a = Seq((1L, 10.0, "O"), (2L, 20.0, "F"), (3L, 30.0, "P"),
      (4L, 40.0, "O")).toDF("k", "price", "st")
    val b = Seq((1L, 10.0, "O"),              // unchanged → dropped
      (2L, 21.0, "F"),                        // price changed
      (3L, 30.0, "F"),                        // status changed
      (5L, 50.0, "O")).toDF("k", "price", "st") // new key; 4 removed
    val d = Cdc.snapshotDiff(a, b, Seq("k"), Seq("price", "st"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(d == Seq((2L, "changed"), (3L, "changed"), (4L, "removed"),
      (5L, "added")))
  }

  test("snapshotDiff plan: one join, digests computed below the exchange") {
    val a = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).cast("double").as("v"))
    val b = spark.range(100).select(col("id").as("k"),
      (col("id") * 3).cast("double").as("v"))
    val plan = Cdc.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    // the join must compare 8-byte digests, not raw payload columns:
    // fnv1a64 appears on the scan side (below the join), and the join
    // itself is a single FullOuter
    assert(plan.contains("FullOuter"), plan)
    assert("fnv1a64".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("canonical separator distinguishes field boundaries") {
    import spark.implicits._
    // ("ab", "c") and ("a", "bc") must hash differently
    val x = Checksum.datasetChecksum(
      Seq(("s", "ab", "c")).toDF("src", "f1", "f2"), "src", Seq("f1", "f2"))
      .select("xor_fp").collect().head.getLong(0)
    val y = Checksum.datasetChecksum(
      Seq(("s", "a", "bc")).toDF("src", "f1", "f2"), "src", Seq("f1", "f2"))
      .select("xor_fp").collect().head.getLong(0)
    assert(x != y)
  }
}
