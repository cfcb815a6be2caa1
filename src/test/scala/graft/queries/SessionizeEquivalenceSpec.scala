package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q32's manual sessionization (lag → boundary flag → running sum) must
  * agree with Spark's built-in `session_window` on the events data: same
  * number of sessions per user and the same (n_events, duration) multiset.
  * (The two differ only on gaps of EXACTLY the threshold — q32 keeps them
  * in-session, session_window starts a new one — impossible on this
  * sub-microsecond-timestamped data, asserted below.) */
class SessionizeEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("manual lag-sum sessions equal built-in session_window sessions") {
    val dir = "/root/testdata/sf0.001"
    val events = EventTime.load(spark, dir)

    // no gap is exactly the 30-minute threshold (the only divergence case)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val exactGaps = events
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .filter(col("gap") === 1800000000L).count()
    assert(exactGaps == 0, "data has an exact-threshold gap; comparison invalid")

    val manual = AdvancedJoinQueries.q32Sessionize(spark, dir)
      .select(col("user_id"), col("n_events"), col("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap

    val builtin = events
      .withColumn("ts_ts", expr("timestamp_micros(ts_us)"))
      .groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts_ts"))) - unix_micros(min(col("ts_ts"))))
          .as("duration_us"))
      .select(col("user_id"), col("n_events"), col("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap

    assert(manual == builtin)
  }

  test("session_window end is last-event + gap (the stream-session oracle's contract)") {
    // the excel_stream_session oracle reconstructs session_end_us as
    // max(ts)+gap over q32's session assignment — valid only if Spark's
    // session_window really closes sessions at last-event + gap. Pin that
    // on crafted data: gaps just under/over 30 min, multi-user overlap.
    import spark.implicits._
    val gapUs = 1800000000L // 30 min
    val t0 = 1767225600000000L // 2026-01-01T00:00:00Z in epoch-µs
    val events = Seq(
      (1L, t0), (1L, t0 + gapUs - 1), // same session (gap < 30 min)
      (1L, t0 + 3 * gapUs), // new session after silence
      (2L, t0 + 5)) // other user, overlapping time range
      .toDF("user_id", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val got = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"),
        unix_micros(max(col("ts"))).as("last_us"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("start_us"),
        expr("unix_micros(session_window.end)").as("end_us"),
        col("n"), col("last_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(r => (r._1, r._2)).toSeq
    got.foreach { case (u, start, end, _, last) =>
      assert(end == last + gapUs,
        s"user $u session [$start,$end): end must be last-event($last) + gap")
    }
    assert(got.map(r => (r._1, r._2, r._4)) == Seq(
      (1L, t0, 2L), (1L, t0 + 3 * gapUs, 1L), (2L, t0 + 5, 1L)))
  }
}
