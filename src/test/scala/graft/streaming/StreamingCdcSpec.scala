package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for [[StreamingCdc.latestState]]: per-key state merges
  * across micro-batches by highest seq, tombstones persist in state so
  * late lower-seq events cannot resurrect a key, and each touched key
  * emits its then-current state once per batch. */
class StreamingCdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("state merges across batches; tombstones win and stay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingCdc.latestState(
      input.toDF().toDF("k", "op", "seq", "v"), "k", "seq", "op", "v")
    val q = out.writeStream.format("memory")
      .queryName("cdc_out").outputMode("update").start()
    def snapshot(): Map[Long, (String, Long, Long)] =
      graft.operators.Cdc.latestSnapshot(
        spark.table("cdc_out"), "k", "last_seq", "op", Seq("v"))
        .collect().map(r => r.getLong(0) -> (("live", r.getLong(1), r.getLong(2))))
        .toMap.map { case (k, (_, v, s)) => k -> (("live", v, s)) }
    try {
      // batch 1: inserts; key 1 gets an in-batch update too (seq wins)
      input.addData((1L, "I", 1L, 10L), (1L, "U", 2L, 11L),
        (2L, "I", 1L, 20L), (3L, "I", 1L, 30L))
      q.processAllAvailable()
      val b1 = spark.table("cdc_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(b1 == Set((1L, "U", 2L, 11L), (2L, "I", 1L, 20L),
        (3L, "I", 1L, 30L)),
        "batch 1 must emit each key's current state once")

      // batch 2: update key 2 (merges against batch-1 STATE), delete key 3,
      // and a LATE lower-seq update on key 1 that must lose to state
      input.addData((2L, "U", 5L, 22L), (3L, "D", 9L, 0L),
        (1L, "U", 1L, 99L))
      q.processAllAvailable()
      val live = snapshot()
      assert(live(1L)._2 == 11L && live(1L)._3 == 2L,
        s"late seq-1 update must not beat state seq 2: $live")
      assert(live(2L)._2 == 22L && live(2L)._3 == 5L)
      assert(!live.contains(3L), "tombstoned key must drop from the view")

      // batch 3: post-tombstone lower-seq upsert cannot resurrect key 3
      input.addData((3L, "U", 4L, 33L))
      q.processAllAvailable()
      assert(!snapshot().contains(3L),
        "a late upsert below the tombstone's seq must stay dead")
    } finally q.stop()
  }
}
