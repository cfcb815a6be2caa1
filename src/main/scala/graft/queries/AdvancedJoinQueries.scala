package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal/interval join operators over `events` / `lineitem` — the join
  * shapes Spark lacks natively, re-expressed as scalable compositions
  * (union+window as-of; bucketed range join). Both are SQL-expressible in
  * DuckDB (native ASOF JOIN / plain range predicate), so both gate queries
  * are hash-checked against real oracles. */
object AdvancedJoinQueries {

  // ---------------------------------------------------------------- q25
  /** Backward as-of join: every event against the most recent high-value
    * (>= 99.0) event of the same type at-or-before it. Right side is
    * pre-aggregated to one row per (type, ts) — the operator's uniqueness
    * contract. Timestamps are normalized to epoch-MICROS on both engines
    * first ([[EventTime.load]] — sub-µs or type-mapping divergence between
    * the engines is settled there once). */
  def q25AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = EventTime.load(spark, dir)
    val refs = events.filter(col("value") >= 99.0)
      .groupBy(col("event_type"), col("ts_us"))
      .agg(max(col("value")).as("ref_value"))
      .select(col("event_type"), col("ts_us").as("ref_ts_us"), col("ref_value"))
    AsOfJoin.backward(
      events.select(col("event_id"), col("event_type"), col("ts_us")),
      refs, Seq("event_type"), "ts_us", "ref_ts_us")
      .select(col("event_id"), col("event_type"), col("ref_value"),
        (col("ts_us") - col("ref_ts_us")).as("lag_us"))
      .orderBy(col("event_id"))
  }

  val q25Sql: String =
    """WITH refs AS (
      |  SELECT event_type, ts, MAX(value) AS ref_value
      |  FROM events WHERE value >= 99.0 GROUP BY event_type, ts)
      |SELECT e.event_id, e.event_type, r.ref_value,
      |  epoch_us(e.ts) - epoch_us(r.ts) AS lag_us
      |FROM events e ASOF JOIN refs r
      |  ON e.event_type = r.event_type AND e.ts >= r.ts
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Bucketed range join: lineitem prices against (overlapping) price
    * bands — a row on a band boundary or inside the catch-all band matches
    * multiple intervals, proving interval (not equi) semantics. */
  def q26RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice"))
    val bands = Seq(
      ("any", 0.0, 120000.0),
      ("budget", 0.0, 20000.0),
      ("mid", 20000.0, 50000.0),
      ("premium", 50000.0, 120000.0)).toDF("band", "lo", "hi")
    RangeJoin.bucketed(li, bands, "l_extendedprice", "lo", "hi",
      bucketWidth = 5000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("band"))
  }

  val q26Sql: String =
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('any', 0.0, 120000.0), ('budget', 0.0, 20000.0),
      |  ('mid', 20000.0, 50000.0), ('premium', 50000.0, 120000.0))
      |SELECT band, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN bands
      |  ON l_extendedprice >= lo AND l_extendedprice <= hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q31
  /** RANGE-frame window (value frame over event time, peers included —
    * the frame kind q10's ROWS running sum does not cover): per event
    * type, the rolling 1-hour sum of value. Timestamps in micros (same
    * cross-engine normalization as q25, via [[EventTime.load]]); DECIMAL
    * sum keeps the frame aggregation exact and order-independent. */
  def q31RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    EventTime.load(spark, dir)
      .select(col("event_id"), col("event_type"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  val q31Sql: String =
    """SELECT event_id, event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY event_type ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Gap-based sessionization: a user's events belong to one session until
    * a >30-minute silence; classic lag→flag→running-sum composition (one
    * shuffle+sort per user partition). Deterministic under timestamp ties:
    * tied events have gap 0, so tie order can't change session boundaries,
    * counts, or min/max duration. */
  def q32Sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))

  /** Shared Spark-side sessionization — the exact twin of [[sessionCte]]
    * (both gates AND both oracle mirrors replay one 30-minute-silence
    * rule; a threshold or tie-handling change lands in exactly two
    * places, one per engine): events with a per-user `session_id` from
    * the lag→flag→running-sum composition. */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val runningSum = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    EventTime.load(spark, dir)
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > 1800000000L ||
          lag(col("ts_us"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(runningSum))
  }

  /** Shared DuckDB mirror of the gap-based sessionization — ends in
    * `sessions(user_id, ts_us, session_id)` so both the per-session gate
    * (q32) and the daily bounce-rate rollup (q74) replay the identical
    * 30-minute-silence rule. */
  private val sessionCte: String =
    """flagged AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 1800000000
      |           OR LAG(epoch_us(ts), 1) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      |sessions AS (
      |  SELECT user_id, ts_us,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)""".stripMargin

  val q32Sql: String =
    s"""WITH $sessionCte
      |SELECT user_id, session_id::BIGINT AS session_id,
      |  COUNT(*) AS n_events,
      |  (MAX(ts_us) - MIN(ts_us))::BIGINT AS duration_us
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q74
  /** DAILY BOUNCE RATE — single-event sessions as a share of all
    * sessions that STARTED that day, the engagement-health number every
    * event dashboard leads with. Reuses q32's sessionization verbatim
    * (one user-partitioned window shuffle); sessions collapse to
    * (day, 2 counters) via partial agg, the share is an integral micro
    * division over the ≤|days| summary. Deterministic under ties for
    * the same reason q32 is: tied events have gap 0. */
  def q74BounceRate(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"))
      .select(expr("start_us div 86400000000").as("day_id"),
        (col("n_events") === 1).cast("bigint").as("bounced"))
      .groupBy("day_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("bounced")).as("n_bounced"))
      .select(col("day_id"), col("n_sessions"), col("n_bounced"),
        // decimal(38,0) product: the oracle accumulates HUGEINT, so a
        // bigint n*1e6 would wrap first at ~9.2e12 sessions per day
        expr("""cast((cast(n_bounced as decimal(38,0)) * 1000000)
                 div n_sessions as bigint)""").as("bounce_micro"))
      .orderBy("day_id")

  val q74Sql: String =
    s"""WITH $sessionCte,
      |per AS (
      |  SELECT user_id, session_id, COUNT(*)::BIGINT AS n_events,
      |    MIN(ts_us) AS start_us
      |  FROM sessions GROUP BY 1, 2),
      |daily AS (
      |  SELECT start_us // 86400000000 AS day_id,
      |    COUNT(*)::BIGINT AS n_sessions,
      |    SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounced
      |  FROM per GROUP BY 1)
      |SELECT day_id::BIGINT AS day_id, n_sessions, n_bounced,
      |  CAST(n_bounced::HUGEINT * 1000000 // n_sessions AS BIGINT)
      |    AS bounce_micro
      |FROM daily ORDER BY day_id""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Bloom semi-join reduction: revenue of lineitems belonging to URGENT
    * orders, with the fact stream pruned ROW-LOCALLY by a broadcast
    * Bloom filter over the urgent orderkeys before the exact semi join
    * ([[graft.operators.Bloom.prune]]). The answer is exactly the plain
    * semi join's (bloom filters have no false negatives), which is what
    * the oracle checks — the bloom only changes WHERE rows die: at the
    * scan, before any exchange, instead of inside the join. At 100 TB
    * this is the difference between shuffling the full fact table and
    * shuffling only probable matches; here the dim side also broadcasts,
    * so the fact side never exchanges at all (pinned in PlanQualitySpec). */
  def q50BloomSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // fast xxhash64 probes: no oracle ever mirrors the filter itself
    // (false positives die in the exact join), so the codegen path wins
    val bloom = graft.operators.Bloom.buildFast(urgent, "o_orderkey")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
    graft.operators.Bloom.pruneFast(li, "l_orderkey", bloom)
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val q50Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q59
  /** LAST-TOUCH ATTRIBUTION — the marketing/conversion rollup every
    * event warehouse runs: each purchase attributes to the user's most
    * recent preceding click (backward as-of join per user), but only
    * within a 24 h window (a stale click attributes nothing — the filter
    * applies AFTER the as-of pick, which is what makes it last-touch
    * rather than any-touch). The click's campaign rides in from the
    * props JSON (q24's extraction), and revenue rolls up per campaign in
    * exact DECIMAL.
    *
    * Same-ts duplicate clicks collapse deterministically (max campaign)
    * before the join — as-of semantics need a unique timeline per key on
    * the reference side, the q25 discipline. Scale: the as-of join
    * shuffles on user_id (co-partitioned, no range explosion), the
    * rollup is a partial agg over ≤ |campaigns| groups. */
  def q59LastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = EventTime.load(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("click_ts"),
        get_json_object(col("props"), "$.k").cast("long").as("campaign"))
      .groupBy(col("user_id"), col("click_ts"))
      .agg(max(col("campaign")).as("campaign"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts_us", "click_ts")
      .filter(col("ts_us") - col("click_ts") <= 86400000000L)
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"),
        max(col("ts_us") - col("click_ts")).as("max_lag_us"))
      .orderBy(col("campaign"))
  }

  val q59Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, MAX(CAST(props->>'$.k' AS BIGINT)) AS campaign
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |p AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT c.campaign, COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  MAX(epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS max_lag_us
      |FROM p ASOF JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |WHERE epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q59_attribution" -> (q59LastTouchAttribution _, q59Sql),
    "q25_asof_join" -> (q25AsofJoin _, q25Sql),
    "q26_range_join" -> (q26RangeJoin _, q26Sql),
    "q31_range_frame" -> (q31RangeFrame _, q31Sql),
    "q32_sessionize" -> (q32Sessionize _, q32Sql),
    "q74_bounce_rate" -> (q74BounceRate _, q74Sql),
    "q50_bloom_semijoin" -> (q50BloomSemijoin _, q50Sql),
  )
}
