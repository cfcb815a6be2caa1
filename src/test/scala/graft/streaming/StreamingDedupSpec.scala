package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for [[StreamingDedup.firstOccurrence]]: first-ever
  * occurrence wins across micro-batches, within-batch duplicates resolve
  * deterministically to the lowest tiebreak, and distinct keys pass. */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("first-ever occurrence per fingerprint, deterministic within a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val deduped = StreamingDedup.firstOccurrence(
      input.toDF().toDF("doc_id", "fp", "text"), "fp", "doc_id")

    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: fp=x twice (ids 7 and 3 → 3 wins), fp=y once
      input.addData((7L, "x", "late"), (3L, "x", "early"), (5L, "y", "solo"))
      q.processAllAvailable()
      val b1 = spark.table("dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(b1 == Set((3L, "x"), (5L, "y")))

      // batch 2: fp=x again (dropped — state remembers), fp=z new (emitted)
      input.addData((9L, "x", "dup-later"), (8L, "z", "new"))
      q.processAllAvailable()
      val b2 = spark.table("dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(b2 == Set((3L, "x"), (5L, "y"), (8L, "z")))
    } finally q.stop()
  }

  test("works in batch mode too (no prior state: plain canonical dedup)") {
    import spark.implicits._
    val df = Seq((7L, "x"), (3L, "x"), (5L, "y")).toDF("doc_id", "fp")
    val got = StreamingDedup.firstOccurrence(df, "fp", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "x"), (5L, "y")))
  }

  test("null fingerprint does not collide with the literal string \"null\"") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("null")), (3L, Some("null")),
      (4L, Option.empty[String])).toDF("doc_id", "fp")
    val got = StreamingDedup.firstOccurrence(df, "fp", "doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // null keys and "null" keys are distinct groups; each emits its own
    // lowest-tiebreak first occurrence instead of one suppressing the other
    assert(got == Set((1L, None), (2L, Some("null"))))
  }

  test("rejects a non-long tiebreak column") {
    import spark.implicits._
    val df = Seq(("a", "x")).toDF("doc_id", "fp")
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.firstOccurrence(df, "fp", "doc_id")
    }
    assert(e.getMessage.contains("LongType"))
  }

  private val baseText = "the quick brown fox jumps over the lazy dog near " +
    "the river bank every single morning before the market opens for trade"

  test("near-dup hits: cross-batch exact copy and near copy, distinct passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // one word changed in ~20 shingles is jaccard ≈ 0.74 — threshold set
    // below it so the near copy (not just the exact copy) is in range
    val hits = StreamingDedup.nearDupHits(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6)
    val q = hits.writeStream.format("memory")
      .queryName("neardup_out").outputMode("append").start()
    try {
      input.addData((1L, baseText),
        (2L, "completely different content about columnar engines and " +
          "catalyst optimizer rules in distributed query processing today"))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0)

      // batch 2: exact copy of 1 (est 1.0) and a one-word edit of 1
      input.addData((10L, baseText), (11L, baseText.replace("lazy", "sleepy")))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"), min("est_j").as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
        .sortBy(_._1)
      assert(got.map(t => (t._1, t._2)) == List((10L, 1L), (11L, 1L)), got)
      assert(got.head._3 == 1.0) // identical text → identical signature
      assert(got(1)._3 >= 0.6 && got(1)._3 < 1.0)
    } finally q.stop()
  }

  test("near-dup hits: within-batch ties flag the higher id against the lower") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDupHits(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = hits.writeStream.format("memory")
      .queryName("neardup_tie_out").outputMode("append").start()
    try {
      input.addData((9L, baseText), (4L, baseText), (6L, baseText))
      q.processAllAvailable()
      val got = spark.table("neardup_tie_out")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // 4 arrives "first" (lowest id in the batch); 6 and 9 both resolve to it
      assert(got == Set((6L, 4L), (9L, 4L)))
    } finally q.stop()
  }

  test("near-dup hits: bucketCap stops admission but keeps comparing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDupHits(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bucketCap = 1)
    val q = hits.writeStream.format("memory")
      .queryName("neardup_cap_out").outputMode("append").start()
    try {
      // all three identical: 1 admitted everywhere; 2 and 3 both compare
      // against the resident 1 (flagged) but are never admitted, so 3
      // resolves to 1, not 2
      input.addData((1L, baseText))
      q.processAllAvailable()
      input.addData((2L, baseText))
      q.processAllAvailable()
      input.addData((3L, baseText))
      q.processAllAvailable()
      val got = spark.table("neardup_cap_out")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((2L, 1L), (3L, 1L)))
    } finally q.stop()
  }
}
