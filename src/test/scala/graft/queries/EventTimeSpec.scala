package graft.queries

import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-fixture time contract so a driver-side schema change
  * breaks THIS suite, not the per-round verify run. Round 10's fixture
  * regeneration silently flipped `events.ts` from TIMESTAMP(NANOS) to
  * timestamp[us] mid-round and took 8 gates down at analysis time —
  * [[EventTime]] now absorbs that class of drift, and these tests fail
  * loudly if a future fixture ships a spelling it cannot absorb. */
class EventTimeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("real fixture: EventTime.load normalizes ts to sane epoch-micros") {
    val df = EventTime.load(spark, dir)
    assert(df.schema("ts_us").dataType == LongType)
    assert(df.schema("ts_t").dataType == TimestampType)
    val r = df.agg(min(col("ts_us")), max(col("ts_us")),
      count(lit(1))).collect()(0)
    // 2000-01-01 .. 2100-01-01 in epoch-µs: any unit mixup (ns read as
    // µs, s read as µs) lands outside this band by orders of magnitude
    assert(r.getLong(0) > 946684800000000L,
      s"min ts_us ${r.getLong(0)} predates 2000 — unit mixup?")
    assert(r.getLong(1) < 4102444800000000L,
      s"max ts_us ${r.getLong(1)} past 2100 — unit mixup?")
    assert(r.getLong(2) > 0)
  }

  test("the three historical ts spellings normalize to identical micros") {
    import spark.implicits._
    val micros = Seq(
      1767225600000000L, // 2026-01-01T00:00:00Z
      1767225601500000L, // +1.5 s
      1772323199999999L) // 2026-02-28T23:59:59.999999Z
    val base = Files.createTempDirectory("graft_ts_spellings").toFile
    def load(sub: String) =
      EventTime.load(spark, new java.io.File(base, sub).getAbsolutePath)
        .select("ts_us").as[Long].collect().sorted.toSeq

    // spelling 1: raw int64 (the nanosAsLong view of TIMESTAMP(NANOS))
    micros.map(_ * 1000L).toDF("ts")
      .write.parquet(s"$base/nanos/events.parquet")
    // spelling 2: timestamp[us] without zone → TIMESTAMP_NTZ (round 10+)
    micros.map(us => LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, ZoneOffset.UTC))
      .toDF("ts").write.parquet(s"$base/ntz/events.parquet")
    // spelling 3: zoned instant → TIMESTAMP (TIMESTAMP_LTZ)
    micros.map(us => Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L))
      .toDF("ts").write.parquet(s"$base/ltz/events.parquet")

    assert(load("nanos") == micros)
    assert(load("ntz") == micros)
    assert(load("ltz") == micros)
  }

  test("every batch events gate analyzes against the real fixture") {
    // DataFrame construction runs analysis — exactly the phase the round-10
    // fixture drift broke. excel_stream_session is excluded (its function
    // eagerly executes a streaming job); its time handling is the same
    // EventTime.load path exercised here.
    val eventsGates = Seq(
      "q18_events_hourly", "q24_json_extract", "q25_asof_join",
      "q30_heavy_hitters", "q31_range_frame", "q32_sessionize",
      "q46_gap_fill", "q47_funnel", "q48_retention_cohorts",
      "q49_anomaly_hours", "p02_salted_join", "p06_zorder_layout")
    for (g <- eventsGates) {
      val df = graft.SparkEntry.queries(g)(spark, dir)
      assert(df.schema.nonEmpty, s"$g produced an empty schema")
    }
  }

  test("q56: two-phase prefix sum == single-window sweep on tie-heavy data") {
    import spark.implicits._
    // adversarial: many simultaneous opens/closes, open==close instants,
    // bucket boundaries crossed mid-interval
    val rnd = new scala.util.Random(3)
    val h = 3600000000L
    val events = (0 until 4000).map { i =>
      val t0 = (rnd.nextInt(6) * h / 2) + (rnd.nextInt(4) * 15L * 60000000L)
      val dur = (rnd.nextInt(7) + 1) * 30L * 60000000L
      ("t" + (i % 2), t0, t0 + dur)
    }
    val ep = events.toDF("event_type", "s", "e")
      .select(col("event_type"), col("s").as("t"), lit(1L).as("d"))
      .unionAll(events.toDF("event_type", "s", "e")
        .select(col("event_type"), col("e").as("t"), lit(-1L).as("d")))
      .withColumn("bucket", expr("t div 3600000000"))
    import org.apache.spark.sql.expressions.Window
    // single-window reference (the oracle's formulation)
    val wAll = Window.partitionBy(col("event_type")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = ep.withColumn("concur", sum(col("d")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(struct(col("concur"), (-col("t")).as("negt"))).as("m"))
      .collect().map(r => r.getString(0) ->
        (r.getStruct(1).getLong(0), -r.getStruct(1).getLong(1))).toMap
    // two-phase distributed formulation (the q56 engine shape)
    val perBucket = ep.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("d")).as("delta"))
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("offset", coalesce(sum(col("delta")).over(wOff), lit(0L)))
      .select(col("event_type"), col("bucket"), col("offset"))
    val wRun = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = ep.join(offsets, Seq("event_type", "bucket"))
      .withColumn("concur", col("offset") + sum(col("d")).over(wRun))
      .groupBy(col("event_type"))
      .agg(max(struct(col("concur"), (-col("t")).as("negt"))).as("m"))
      .collect().map(r => r.getString(0) ->
        (r.getStruct(1).getLong(0), -r.getStruct(1).getLong(1))).toMap
    assert(got == ref,
      s"two-phase $got != single-window $ref — prefix-sum decomposition broke")
  }

  test("q56 plan: the data window partitions by (type, bucket), not type") {
    val plan = RelationalQueries.all("q56_max_concurrency")._1(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the running-sum window spec over the endpoint stream must include
    // the hour bucket in its partitioning -- a window keyed on type alone
    // would be the single-partition global sort this operator exists to
    // avoid
    assert(plan.contains("windowspecdefinition(event_type#") &&
      plan.contains(", bucket#"),
      s"expected a (event_type, bucket)-partitioned window:\n${plan.take(3000)}")
  }

  test("p23: lateness is per-user running-max disorder, never negative, " +
    "with ordered percentiles") {
    val out = PipelineQueries.p23LateDataAudit(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, nLate) = (r.getLong(1), r.getLong(2))
      val (p50, p95, p99, mx) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nLate > 0 && nLate < n, s"jitter must plant real disorder: $r")
      assert(p50 <= p95 && p95 <= p99 && p99 <= mx, s"percentile order: $r")
      assert(p50 >= 0 && mx > 0, s"lateness bounds: $r")
    }
    // the window must partition by user_id — per-user disorder, not a
    // global sort (the q56 scale lesson)
    val plan = PipelineQueries.p23LateDataAudit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id#"),
      s"expected a user_id-partitioned window:\n${plan.take(3000)}")
  }
}
