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
}
