package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming lateness (excel_stream_latedata): per-user running-max
  * state must carry across micro-batches and reproduce the batch
  * running-max window exactly for any sequence-monotone split. */
class StreamingLatenessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // (user_id, event_id, event_type, ts_eff)
  private type Row4 = (Long, Long, String, Long)

  private def run(rows: Seq[Row4], splits: Seq[Int]): Map[Long, Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Row4]
    val name = s"late_out_${rows.hashCode.abs}"
    val q = StreamingLateness.lateness(
      input.toDF().toDF("user_id", "event_id", "event_type", "ts_eff"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 +: splits :+ rows.size).sliding(2).foreach { case Seq(a, b) =>
        input.addData(rows.slice(a, b))
        q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    } finally q.stop()
  }

  private def reference(rows: Seq[Row4]): Map[Long, Long] =
    rows.groupBy(_._1).values.flatMap { g =>
      var mx = Long.MinValue
      g.sortBy(_._2).map { case (_, eid, _, ts) =>
        mx = math.max(mx, ts)
        eid -> (mx - ts)
      }
    }.toMap

  test("state carries across batches; any monotone split == batch window") {
    // user 1: on-time, late-by-50, recovers; user 2: all on time
    val rows: Seq[Row4] = Seq(
      (1L, 1L, "a", 100L), (2L, 2L, "a", 10L), (1L, 3L, "b", 50L),
      (1L, 4L, "a", 120L), (2L, 5L, "b", 30L), (1L, 6L, "b", 90L))
    val want = reference(rows)
    assert(want == Map(1L -> 0L, 2L -> 0L, 3L -> 50L, 4L -> 0L,
      5L -> 0L, 6L -> 30L))
    for (splits <- Seq(Seq(3), Seq(2, 4), Seq(1, 2, 3, 4, 5)))
      assert(run(rows, splits) == want, s"split $splits")
  }

  test("within-batch disorder resolves by event_id, not arrival order") {
    // batch delivers user 1's rows out of id order — the operator must
    // sort by event_id before charging lateness
    val rows: Seq[Row4] = Seq(
      (1L, 9L, "a", 40L), (1L, 7L, "a", 100L), (1L, 8L, "a", 60L))
    val got = run(rows, splits = Seq())
    assert(got == Map(7L -> 0L, 8L -> 40L, 9L -> 60L), got.toString)
  }
}
