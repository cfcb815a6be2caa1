package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface exercised through the host Spark engine.
  *
  * The reference (`/root/reference/src/pyspark_datasource/excel/connector.py`)
  * implements a connector only and delegates every relational operator to
  * Spark (SURVEY.md §2.2). These queries pin down that delegated capability
  * surface — one query per operator family — and each has an ANSI-SQL oracle
  * (DuckDB) in [[graft.SparkEntry.oracleSql]].
  *
  * Determinism / oracle-parity conventions:
  *   - money/qty aggregates go through `DECIMAL(18,2)` so the sum is exact
  *     and engine-order-independent, then cast back to `DOUBLE` at the end
  *     (exact decimal → nearest-double is deterministic IEEE in both engines);
  *   - every query ends in an ORDER BY on a unique key;
  *   - integer-ish derived columns are cast to BIGINT to match DuckDB's
  *     wider default types (`year()`, `length()`, `row_number()` …).
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact-decimal view of a money/quantity column. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def asDouble(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: scan + filter + hash agg (partial +
    * final, map-side combine) over the biggest table. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        asDouble(sum(dec($"l_quantity"))).as("sum_qty"),
        asDouble(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        asDouble(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Row-level filter + projection; filter and column pruning reach the
    * parquet scan (PushedFilters / ReadSchema). */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-03-01").cast("timestamp") &&
        $"l_shipdate" < lit("1995-06-01").cast("timestamp") &&
        $"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
      |  AND l_quantity > 45.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Three-way shuffle join (customer ⋈ orders ⋈ lineitem) + agg. */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    cust
      .join(ord, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"c_mktsegment")
      .agg(
        asDouble(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")))
          .as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"c_mktsegment")
  }

  val q03Sql: String =
    """SELECT c_mktsegment,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      | COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Broadcast join: `part` is a small dim — explicitly broadcast so no
    * shuffle of the fact side is needed. */
  def q04BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        asDouble(sum(dec($"l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  val q04Sql: String =
    """SELECT p_brand,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-flavoured five-way join through the region→nation→customer
    * star, revenue per (region, nation). Small dims broadcast. */
  def q05NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = t(spark, dir, "region")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(asDouble(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")))
        .as("revenue"))
      .orderBy($"r_name", $"n_name")
  }

  val q05Sql: String =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6: tight scalar aggregate, everything pushed to the scan. */
  def q06ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.04 && $"l_discount" <= 0.06 &&
        $"l_quantity" < 24.0)
      .agg(asDouble(sum(dec($"l_extendedprice") * dec($"l_discount")))
        .as("revenue"))
  }

  val q06Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.04 AND l_discount <= 0.06
      |  AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Left-semi join (EXISTS): customers having a big order, per nation. */
  def q07SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = t(spark, dir, "orders").filter($"o_totalprice" > 150000.0)
    t(spark, dir, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_nationkey")
  }

  val q07Sql: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Left-anti join (NOT EXISTS): customers with no urgent order. */
  def q08AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = t(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    t(spark, dir, "customer")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .orderBy($"c_custkey")
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name, c_nationkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Window: top-3 orders per customer by row_number. */
  def q09WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  val q09Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) sub
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Window: running total (frame ROWS UNBOUNDED PRECEDING..CURRENT). */
  def q10WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        asDouble(sum(dec($"o_totalprice")).over(w)).as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q10Sql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Global sort + limit (top-k): Spark plans TakeOrderedAndProject —
    * no full sort shuffle of the table. */
  def q11SortLimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      .limit(100)
  }

  val q11Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Set op EXCEPT: nations with a rich customer but no rich supplier. */
  def q12Except(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").filter($"c_acctbal" > 8000.0)
      .select($"c_nationkey".as("nationkey")).distinct()
      .except(
        t(spark, dir, "supplier").filter($"s_acctbal" > 8000.0)
          .select($"s_nationkey".as("nationkey")).distinct())
      .orderBy($"nationkey")
  }

  val q12Sql: String =
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000.0
      |EXCEPT
      |SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000.0
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Set op INTERSECT: nations present on both sides. */
  def q13Intersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_nationkey".as("nationkey")).distinct()
      .intersect(
        t(spark, dir, "supplier").select($"s_nationkey".as("nationkey")).distinct())
      .orderBy($"nationkey")
  }

  val q13Sql: String =
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q14
  /** ROLLUP grouping sets with NULLS FIRST ordering on the super-rows. */
  def q14Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"l_quantity"))).as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val q14Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Multiple DISTINCT aggregates in one pass (Expand-based plan). */
  def q15DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  val q15Sql: String =
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps,
      | COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Scalar function library: string + datetime functions, codegen'd. */
  def q16ScalarFns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select(
        $"o_orderkey",
        upper($"o_orderpriority").as("pri_upper"),
        substring($"o_orderpriority", 1, 1).as("pri_code"),
        length($"o_orderpriority").cast("bigint").as("pri_len"),
        year($"o_orderdate").cast("bigint").as("yr"),
        month($"o_orderdate").cast("bigint").as("mo"),
        concat_ws("-", $"o_orderstatus", $"o_orderpriority").as("tag"))
      .orderBy($"o_orderkey")
  }

  val q16Sql: String =
    """SELECT o_orderkey,
      | UPPER(o_orderpriority) AS pri_upper,
      | SUBSTRING(o_orderpriority, 1, 1) AS pri_code,
      | CAST(LENGTH(o_orderpriority) AS BIGINT) AS pri_len,
      | CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
      | CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
      | CONCAT_WS('-', o_orderstatus, o_orderpriority) AS tag
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Conditional aggregation (TPC-H Q14 promo-revenue flavour). */
  def q17CaseAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .agg(
        asDouble(sum(
          when($"p_type".startsWith("PROMO"),
            dec($"l_extendedprice") * dec(lit(1) - $"l_discount"))))
          .as("promo_revenue"),
        asDouble(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")))
          .as("total_revenue"))
  }

  val q17Sql: String =
    """SELECT
      | CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
      |   END) AS DOUBLE) AS promo_revenue,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Event-time bucketing: the batch shape of a streaming windowed agg.
    * `events.ts` is normalized to a UTC µs TIMESTAMP by
    * [[EventTime.load]], whatever parquet type the fixture ships. */
  def q18EventsHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventTime.load(spark, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts_t").as("hour"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"value"))).as("sum_value"))
      .orderBy($"event_type", $"hour")
  }

  val q18Sql: String =
    """SELECT event_type, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY event_type, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)
      |ORDER BY event_type, hour""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Built-in sketches: HyperLogLog++ distinct counts next to the exact
    * answer. HLL merge is a register-wise max — commutative and
    * associative — so the estimate is deterministic regardless of
    * partitioning. The estimate's VALUE is implementation-defined (Spark's
    * HLL++ ≠ DuckDB's HLL by construction), so the oracle checks what IS
    * semantics: the exact count column exactly, and the estimate pinned
    * inside a 5% relative-error band (2.5× the configured 2% rsd — an
    * accuracy contract, mirrored as a constant TRUE). A sketch drifting
    * out of band fails the gate. */
  def q19ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx_parts" - $"exact_parts").cast("double") /
          $"exact_parts".cast("double") <= 0.05).as("approx_ok"))
      .orderBy($"l_returnflag")
  }

  val q19Sql: String =
    """SELECT l_returnflag,
      |       COUNT(DISTINCT l_partkey) AS exact_parts,
      |       TRUE AS approx_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q20
  /** CUBE grouping sets (all four combinations). */
  def q20Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"o_totalprice"))).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q20Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q21
  /** UNION ALL + distinct aggregation over the union. */
  def q21UnionAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = t(spark, dir, "customer")
      .select($"c_nationkey".as("nationkey"), lit("customer").as("side"))
    val s = t(spark, dir, "supplier")
      .select($"s_nationkey".as("nationkey"), lit("supplier").as("side"))
    c.unionAll(s)
      .groupBy($"nationkey")
      .agg(count(lit(1)).as("n_parties"),
        countDistinct($"side").as("n_sides"))
      .orderBy($"nationkey")
  }

  val q21Sql: String =
    """SELECT nationkey, COUNT(*) AS n_parties, COUNT(DISTINCT side) AS n_sides
      |FROM (
      |  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
      |GROUP BY nationkey ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Uncorrelated scalar subquery: orders above the global average price. */
  def q22ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = t(spark, dir, "orders")
    // exact-decimal global average, same construction both engines
    val avgRow = ord.agg(
      (sum(dec($"o_totalprice")).cast("double") /
        count(lit(1)).cast("double")).as("a"))
      .collect().head
    // empty table -> NULL average -> comparison never true (SQL semantics)
    val avgPrice = if (avgRow.isNullAt(0)) Double.NaN else avgRow.getDouble(0)
    ord.filter($"o_totalprice" > avgPrice)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_above_avg"))
      .orderBy($"o_orderpriority")
  }

  val q22Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_above_avg
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / COUNT(*)::DOUBLE
      |  FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Pivot: order counts per priority pivoted on status. The oracle mirrors
    * it with conditional aggregation (column names aligned). */
  def q23Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot($"o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"o_orderpriority")
  }

  val q23Sql: String =
    """SELECT o_orderpriority,
      | COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      | COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      | COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q24
  /** JSON extraction from the events `props` column. */
  def q24JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("bigint").as("k"))
      .groupBy()
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
  }

  val q24Sql: String =
    """SELECT COUNT(*) AS n,
      | SUM(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
      | MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      | MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Correlated EXISTS through SQL text — exercises Catalyst's subquery
    * decorrelation (RewritePredicateSubquery → semi join), a different
    * optimizer path from the DataFrame left_semi of q07: customers with at
    * least one urgent order above a price floor. */
  def q33ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT'
        |    AND o_totalprice > 150000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q33Sql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderpriority = '1-URGENT'
      |    AND o_totalprice > 150000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Correlated NOT EXISTS (anti decorrelation) with an extra correlated
    * conjunct: customers with no order in their own nation-segment price
    * band. */
  def q34NotExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_totalprice > c_acctbal * 50)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q34Sql: String =
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_totalprice > c_acctbal * 50)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Array aggregation family: collect_set → sort_array → concat_ws,
    * plus a filtered higher-order count. Output stays scalar (joined
    * string) so the oracle compares exactly; the array itself is
    * deterministic because it is sorted before rendering. */
  def q35ArrayAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        concat_ws(",", sort_array(collect_set($"o_orderstatus")))
          .as("statuses"),
        size(sort_array(collect_set($"o_orderstatus"))).cast("bigint")
          .as("n_statuses"),
        countDistinct($"o_custkey").as("n_custs"))
      .orderBy($"o_orderpriority")
  }

  val q35Sql: String =
    """SELECT o_orderpriority,
      | STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      | COUNT(DISTINCT o_orderstatus) AS n_statuses,
      | COUNT(DISTINCT o_custkey) AS n_custs
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Window navigation family: lag / lead / first_value / ntile in one
    * pass over a single (partition, order) spec — one shuffle + sort
    * serves all four frames. */
  def q36WindowNav(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    t(spark, dir, "orders")
      .select(
        $"o_orderkey",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        first($"o_orderkey").over(w).as("first_order"),
        ntile(4).over(w).cast("bigint").as("quartile"))
      .orderBy($"o_orderkey")
  }

  val q36Sql: String =
    """SELECT o_orderkey,
      | LAG(o_totalprice) OVER w AS prev_price,
      | LEAD(o_totalprice) OVER w AS next_price,
      | FIRST_VALUE(o_orderkey) OVER w AS first_order,
      | CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q37
  /** String/regexp function family beyond q16: regexp extract/replace,
    * padding, position, reverse, split_part — all codegen'd built-ins. */
  def q37StringFns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select(
        $"o_orderkey",
        regexp_extract($"o_orderpriority", "(\\d+)", 1).as("pri_num"),
        regexp_replace($"o_orderpriority", "-", "_").as("pri_sub"),
        lpad($"o_orderstatus", 3, "*").as("padded"),
        instr($"o_orderpriority", "-").cast("bigint").as("dash_pos"),
        reverse($"o_orderpriority").as("rev"),
        expr("split_part(o_orderpriority, '-', 2)").as("word"))
      .orderBy($"o_orderkey")
  }

  val q37Sql: String =
    """SELECT o_orderkey,
      | REGEXP_EXTRACT(o_orderpriority, '(\d+)', 1) AS pri_num,
      | REPLACE(o_orderpriority, '-', '_') AS pri_sub,
      | LPAD(o_orderstatus, 3, '*') AS padded,
      | CAST(POSITION('-' IN o_orderpriority) AS BIGINT) AS dash_pos,
      | REVERSE(o_orderpriority) AS rev,
      | SPLIT_PART(o_orderpriority, '-', 2) AS word
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Date/time arithmetic family: truncation, interval add, quarter,
    * month-end, day difference — cross-engine-exact because o_orderdate
    * is a midnight-aligned timestamp in both engines. */
  def q38DateArithmetic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select(
        $"o_orderkey",
        date_trunc("month", $"o_orderdate").as("mon_start"),
        ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("due_ts"),
        quarter($"o_orderdate").cast("bigint").as("qtr"),
        last_day($"o_orderdate").as("eom"),
        datediff($"o_orderdate", to_date(lit("1995-01-01")))
          .cast("bigint").as("days_since"))
      .orderBy($"o_orderkey")
  }

  val q38Sql: String =
    """SELECT o_orderkey,
      | DATE_TRUNC('month', o_orderdate) AS mon_start,
      | o_orderdate + INTERVAL 30 DAY AS due_ts,
      | CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
      | LAST_DAY(o_orderdate::DATE) AS eom,
      | CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Higher-order array functions over the embedding column: transform +
    * aggregate (sequential fold — proven cross-engine-exact by s01),
    * filter, array_max. All lambda machinery, no UDFs, no shuffle. */
  def q39HigherOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "embeddings")
      .select(
        $"vec_id",
        round(aggregate(
          transform($"embedding", x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 6).as("l2_sq"),
        size(filter($"embedding", x => x > 0.0f)).cast("bigint").as("n_pos"),
        round(array_max(transform($"embedding",
          x => abs(x.cast("double")))), 6).as("max_abs"))
      .orderBy($"vec_id")
  }

  val q39Sql: String =
    """SELECT vec_id,
      | ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
      |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS l2_sq,
      | LEN(LIST_FILTER(embedding, x -> x > 0))::BIGINT AS n_pos,
      | ROUND(LIST_MAX(LIST_TRANSFORM(embedding,
      |   x -> ABS(CAST(x AS DOUBLE)))), 6) AS max_abs
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Rank-distribution window family — percent_rank / cume_dist /
    * dense_rank (the one window group q09/q36 leave uncovered). Tie
    * handling is value-determined, so results are deterministic under any
    * partitioning; the (rank-1)/(n-1) and peaks/n divisions are single
    * double ops, rounded 6 for cross-engine compare. */
  def q44RankDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
    t(spark, dir, "orders")
      .select(
        $"o_orderkey",
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"),
        dense_rank().over(w).cast("bigint").as("drank"))
      .orderBy($"o_orderkey")
  }

  val q44Sql: String =
    """SELECT o_orderkey,
      | ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      | ROUND(CUME_DIST() OVER w, 6) AS cum_dist,
      | CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Recursive CTE (Spark 4's WITH RECURSIVE): a 12-row month series
    * generated by the recursion anchoring a LEFT JOIN + aggregate —
    * exercises the UnionLoop execution path; identical SQL runs on the
    * oracle side. */
  def q40RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(q40Sql)
  }

  val q40Sql: String =
    """WITH RECURSIVE m(n) AS (
      |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
      |SELECT n AS month, COUNT(o_orderkey) AS n_orders
      |FROM m LEFT JOIN orders ON MONTH(o_orderdate) = n
      |GROUP BY n ORDER BY n""".stripMargin

  // ---------------------------------------------------------------- q42
  /** UNPIVOT (relational melt) — wide per-flag aggregates to long
    * (flag, metric, value) form; exact-decimal sums so the doubles are
    * order-independent. Identical SQL text runs on both engines. */
  def q42Unpivot(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(q42Sql)
  }

  val q42Sql: String =
    """WITH agg AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |    CAST(COUNT(*) AS DOUBLE) AS cnt
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, value
      |FROM agg UNPIVOT (value FOR metric IN (qty, cnt))
      |ORDER BY l_returnflag, metric""".stripMargin

  // ---------------------------------------------------------------- q43
  /** LATERAL correlated subquery join (a per-row dependent subplan that
    * the optimizer decorrelates into a join) — identical SQL text on both
    * engines. */
  def q43LateralJoin(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("nation")
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(q43Sql)
  }

  val q43Sql: String =
    """SELECT n_name, t.c AS n_customers
      |FROM nation, LATERAL (
      |  SELECT COUNT(*) AS c FROM customer
      |  WHERE c_nationkey = n_nationkey) t
      |ORDER BY n_name""".stripMargin

  /** name → (query fn, oracle SQL) for everything in this object. */
  // ---------------------------------------------------------------- q46
  /** Time-series GAP FILL: hourly event aggregates joined onto a dense
    * per-type calendar spine (`sequence` of hours between each type's
    * first and last event), zero-filling counts and carrying the last
    * observed value forward (`last(..., ignoreNulls)` over an ordered
    * window) — the resample/as-of-carry pattern every monitoring and
    * feature pipeline runs. The spine is generated from a per-type
    * 2-row bound aggregate, so its cost scales with the TIME SPAN, not
    * the event count, and the carry window partitions by type — fully
    * parallel. */
  def q46GapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = EventTime.load(spark, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts_t").as("hour"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"value"))).as("sum_value"))
    val spine = hourly.groupBy($"event_type")
      .agg(min($"hour").as("h0"), max($"hour").as("h1"))
      .select($"event_type",
        explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy($"event_type").orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("n", coalesce($"n", lit(0L)))
      .withColumn("carry_value",
        last($"sum_value", ignoreNulls = true).over(w))
      .select($"event_type", $"hour", $"n", $"sum_value", $"carry_value")
      .orderBy($"event_type", $"hour")
  }

  val q46Sql: String =
    """WITH hourly AS (
      |  SELECT event_type,
      |    CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type,
      |    UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
      |        FROM hourly GROUP BY 1))
      |SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n, h.sum_value,
      |  LAST_VALUE(h.sum_value IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_value
      |FROM spine s
      |LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
      |ORDER BY s.event_type, s.hour""".stripMargin

  // ---------------------------------------------------------------- q47
  /** FUNNEL analysis (view → click → purchase, strictly ordered per
    * user): stage N's timestamp must follow stage N-1's first hit — the
    * sequential-pattern query behind conversion and activation metrics.
    * Each stage is one co-partitioned groupBy on user_id feeding the
    * next stage's filter; timestamps stay raw int64 nanos end to end
    * (comparisons only — no calendar math, no precision loss). Counts
    * and drop-off ratios are integral, so the oracle is exact. */
  def q47Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = t(spark, dir, "events").select($"user_id", $"event_type", $"ts")
    val s1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("step", lit(1L))
      .unionAll(s2.agg(count(lit(1)).as("n")).withColumn("step", lit(2L)))
      .unionAll(s3.agg(count(lit(1)).as("n")).withColumn("step", lit(3L)))
    counts
      .withColumn("stage", element_at(
        array(lit("1_view"), lit("2_click"), lit("3_purchase")),
        $"step".cast("int")))
      .withColumn("pct_of_first_micro",
        expr("(n * 1000000) div first_value(n) over (order by step " +
          "rows between unbounded preceding and unbounded following)"))
      .select($"step", $"stage", $"n".as("n_users"), $"pct_of_first_micro")
      .orderBy("step")
  }

  val q47Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN s2 ON s2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
      |counts AS (
      |  SELECT 1::BIGINT AS step, '1_view' AS stage,
      |         (SELECT COUNT(*) FROM s1)::BIGINT AS n_users
      |  UNION ALL
      |  SELECT 2, '2_click', (SELECT COUNT(*) FROM s2)
      |  UNION ALL
      |  SELECT 3, '3_purchase', (SELECT COUNT(*) FROM s3))
      |SELECT step, stage, n_users,
      |  ((n_users * 1000000) // FIRST_VALUE(n_users) OVER (ORDER BY step
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |    ::BIGINT AS pct_of_first_micro
      |FROM counts ORDER BY step""".stripMargin

  // ---------------------------------------------------------------- q48
  /** RETENTION COHORTS: users grouped by first-activity week, tracked by
    * weeks-since-cohort — the triangular matrix behind every growth
    * dashboard. Week truncation is ISO-Monday in both engines; offsets
    * are integral day-diffs div 7; retention is a micro-unit integral
    * ratio against the cohort's size. Scale shape: one distinct over
    * (user, week) — fixed-width — then a per-user min and two
    * partial-agg groupBys; nothing is ever per-event after the first
    * projection. */
  def q48RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weeks = EventTime.load(spark, dir)
      .select($"user_id",
        date_trunc("week", $"ts_t").cast("date").as("week"))
      .distinct()
    val cohorts = weeks.groupBy($"user_id")
      .agg(min($"week").as("cohort_week"))
    val sizes = cohorts.groupBy($"cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    weeks.join(cohorts, "user_id")
      .withColumn("k", expr("datediff(week, cohort_week) div 7"))
      .groupBy($"cohort_week", $"k")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .withColumn("retention_micro",
        expr("(n_active * 1000000) div cohort_size"))
      .select($"cohort_week", $"k", $"n_active", $"cohort_size",
        $"retention_micro")
      .orderBy($"cohort_week", $"k")
  }

  val q48Sql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(DATE_TRUNC('week', ts) AS DATE) AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1),
      |sizes AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort_week,
      |    (DATE_DIFF('day', c.cohort_week, w.week) // 7)::BIGINT AS k,
      |    COUNT(*) AS n_active
      |  FROM weeks w JOIN cohorts c ON c.user_id = w.user_id
      |  GROUP BY 1, 2)
      |SELECT cells.cohort_week, k, n_active, cohort_size,
      |  ((n_active * 1000000) // cohort_size)::BIGINT AS retention_micro
      |FROM cells JOIN sizes ON sizes.cohort_week = cells.cohort_week
      |ORDER BY cells.cohort_week, k""".stripMargin

  // ---------------------------------------------------------------- q55
  /** ROLLING DISTINCT users — exact trailing-7-day unique-user counts
    * per day (the WAU curve next to the DAU curve), the canonical
    * rolling-cardinality report. COUNT(DISTINCT) does not slide: unlike
    * a sum, cardinality can't be incrementally retired, so the scalable
    * exact plan is (1) collapse the raw stream to DISTINCT (day, user)
    * pairs — one map-side-combinable shuffle that shrinks 100 TB of
    * events to bounded day×user pairs; (2) fan each pair out to the ≤ 7
    * trailing report days via a BROADCAST day-dimension join (the
    * dimension is rows-of-days tiny, so the fan-out is a nested-loop
    * over a broadcast, never a shuffle); (3) one distinct-agg by day.
    * The ×7 expansion of the PAIRS table (not the events table) is the
    * exact price of exactness; the sketch path for wider windows is
    * q51's mergeable HLL union. */
  def q55RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = EventTime.load(spark, dir)
      .select(to_date($"ts_t").as("day"), $"user_id").distinct()
    val days = pairs.select($"day").distinct()
    val daily = pairs.groupBy($"day").agg(count(lit(1)).as("users_1d"))
    val rolled = broadcast(days.select($"day".as("d")))
      .join(pairs, $"day".between(date_sub($"d", 6), $"d"))
      .groupBy($"d")
      .agg(countDistinct($"user_id").as("users_7d"))
      .select($"d".as("day"), $"users_7d")
    days.join(rolled, "day").join(daily, "day")
      .select($"day", $"users_7d", $"users_1d")
      .orderBy($"day")
  }

  val q55Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM pairs),
      |daily AS (
      |  SELECT day, COUNT(*)::BIGINT AS users_1d FROM pairs GROUP BY 1),
      |rolled AS (
      |  SELECT d.day, COUNT(DISTINCT p.user_id)::BIGINT AS users_7d
      |  FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY 1)
      |SELECT d.day, r.users_7d, dl.users_1d
      |FROM days d JOIN rolled r USING (day) JOIN daily dl USING (day)
      |ORDER BY d.day""".stripMargin

  // ---------------------------------------------------------------- q56
  /** MAXIMUM CONCURRENCY sweep — how many intervals overlap at the peak,
    * and when the peak first occurs — the classic +1/−1 endpoint sweep
    * behind concurrent-sessions, capacity and license-audit queries.
    * Each event opens an interval of (event_id % 7 + 1) minutes.
    *
    * The naive sweep is a GLOBAL running sum — a single-partition sort
    * per event type, the scale killer. This runs the distributed
    * TWO-PHASE PREFIX SUM instead: (1) endpoints bucket by hour and a
    * partial-agg rollup computes each bucket's net delta; (2) a window
    * over the BUCKET TABLE (rows = time-span hours, thousands — never
    * the data) turns deltas into per-bucket starting offsets;
    * (3) the within-bucket running sum windows on (type, bucket) — fully
    * parallel across buckets — and adds the offset. Max and first-peak
    * come from one max_by-style struct aggregate, no second pass.
    *
    * Tie discipline: simultaneous endpoints order (t, d) so closes
    * (−1) precede opens (+1) — half-open [s, e) intervals, zero-length
    * overlap does not count. Within equal (t, d) the prefix-sum MULTISET
    * is permutation-invariant (equal deltas), so max and first-peak are
    * engine-independent — the oracle runs the single-window formulation
    * and must agree exactly. */
  def q56MaxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = EventTime.load(spark, dir)
      .select($"event_type", $"ts_us", $"event_id")
    val dur = (pmod($"event_id", lit(7)) + 1) * lit(60000000L)
    val endpoints = ev.select($"event_type", $"ts_us".as("t"), lit(1L).as("d"))
      .unionAll(ev.select($"event_type", ($"ts_us" + dur).as("t"),
        lit(-1L).as("d")))
      .withColumn("bucket", expr("t div 3600000000"))
    val perBucket = endpoints.groupBy($"event_type", $"bucket")
      .agg(sum($"d").as("delta"))
    val wOff = Window.partitionBy($"event_type").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("offset", coalesce(sum($"delta").over(wOff), lit(0L)))
      .select($"event_type", $"bucket", $"offset")
    val wRun = Window.partitionBy($"event_type", $"bucket")
      .orderBy($"t", $"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    endpoints.join(offsets, Seq("event_type", "bucket"))
      .withColumn("concur", $"offset" + sum($"d").over(wRun))
      .groupBy($"event_type")
      .agg(max(struct($"concur", (-$"t").as("negt"))).as("m"),
        count(lit(1)).as("n_endpoints"))
      .select($"event_type", $"m.concur".as("max_concurrent"),
        (-$"m.negt").as("first_peak_us"), $"n_endpoints")
      .orderBy($"event_type")
  }

  /** Single-window sweep formulation — must equal the distributed
    * two-phase prefix sum exactly. */
  val q56Sql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us, event_id FROM events),
      |ep AS (
      |  SELECT event_type, ts_us AS t, 1 AS d FROM ev
      |  UNION ALL
      |  SELECT event_type, ts_us + (event_id % 7 + 1) * 60000000, -1 FROM ev),
      |run AS (
      |  SELECT event_type, t, d,
      |    SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concur
      |  FROM ep),
      |mx AS (SELECT event_type, MAX(concur) AS max_concurrent
      |       FROM run GROUP BY 1),
      |n AS (SELECT event_type, COUNT(*) AS n_endpoints FROM ep GROUP BY 1)
      |SELECT r.event_type, m.max_concurrent::BIGINT AS max_concurrent,
      |  MIN(r.t)::BIGINT AS first_peak_us,
      |  ANY_VALUE(n.n_endpoints)::BIGINT AS n_endpoints
      |FROM run r
      |JOIN mx m ON m.event_type = r.event_type
      |         AND r.concur = m.max_concurrent
      |JOIN n ON n.event_type = r.event_type
      |GROUP BY r.event_type, m.max_concurrent
      |ORDER BY r.event_type""".stripMargin

  // ---------------------------------------------------------------- q57
  /** HOPPING (sliding) event-time windows — 1-hour windows advancing
    * every 20 minutes, so each event lands in exactly 3 overlapping
    * windows. The batch twin of streaming hop windows, built the way the
    * streaming engine builds them: a map-side slot fan-out (one
    * `explode(sequence(0, slots−1))` per event — narrow, no join) then
    * ONE partial-aggregated rollup on (type, window start). q18 is the
    * tumbling special case (slots = 1); the 3× row inflation happens
    * before the combine, so the exchange still carries only aggregated
    * (type, window) rows. Epoch-µs integer arithmetic throughout;
    * exact-decimal value sums per the repo determinism discipline. */
  def q57HoppingWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hop = 1200000000L // 20 min in µs
    val slots = 3 // window = 3 hops = 1 h
    EventTime.load(spark, dir)
      .select($"event_type", $"ts_us", $"value")
      .withColumn("j", explode(expr(s"sequence(0, ${slots - 1})")))
      .withColumn("win_start_us",
        (expr(s"ts_us div $hop") - $"j") * lit(hop))
      .groupBy($"event_type", $"win_start_us")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"value"))).as("sum_value"))
      .orderBy($"event_type", $"win_start_us")
  }

  val q57Sql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us, value FROM events),
      |sl AS (
      |  SELECT event_type, value,
      |    ((ts_us // 1200000000) - j) * 1200000000 AS win_start_us
      |  FROM ev CROSS JOIN RANGE(0, 3) t(j))
      |SELECT event_type, win_start_us, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM sl GROUP BY 1, 2
      |ORDER BY event_type, win_start_us""".stripMargin

  // ---------------------------------------------------------------- q61
  /** PIVOT (cross-tab): order counts by priority × status through
    * Spark's `RelationalGroupedDataset.pivot` with an EXPLICIT value
    * list — the explicit list is the 100-TB-safe form (implicit pivot
    * first runs a distinct-values collect back to the driver; the
    * explicit one compiles straight to conditional aggregation, one
    * partial-agg shuffle, no extra job). Absent cells are 0, not NULL,
    * matching the conditional-aggregation SQL spelling. */
  def q61Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }

  val q61Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)::BIGINT AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END)::BIGINT AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END)::BIGINT AS n_p
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q73
  /** TPC-H Q9-flavored STAR JOIN down the supplier/part path (q05 covers
    * the customer path): promo-part revenue by (supplier nation, order
    * year). The dim filter (`p_type = 'PROMO'`) is pushed into the part
    * scan, so only ~1/6 of part reaches the join; nation (fixed 25 rows)
    * is the only forced broadcast — part and supplier GROW with the
    * corpus, so their join strategy is deliberately left to
    * Catalyst/AQE, which at 100 TB correctly picks shuffle joins on the
    * key while at small SF it broadcasts. Revenue follows the q05
    * exact-DECIMAL discipline. */
  def q73StarProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(spark, dir, "part").filter($"p_type" === "PROMO"),
        $"l_partkey" === $"p_partkey")
      .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(t(spark, dir, "nation")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").cast("bigint").as("o_year"))
      .agg(
        asDouble(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"n_name", $"o_year")
  }

  val q73Sql: String =
    """SELECT n_name, YEAR(o_orderdate)::BIGINT AS o_year,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      | COUNT(*)::BIGINT AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, o_year
      |ORDER BY n_name, o_year""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q73_star_profit" -> (q73StarProfit _, q73Sql),
    "q61_pivot" -> (q61Pivot _, q61Sql),
    "q55_rolling_distinct" -> (q55RollingDistinct _, q55Sql),
    "q57_hopping_windows" -> (q57HoppingWindows _, q57Sql),
    "q56_max_concurrency" -> (q56MaxConcurrency _, q56Sql),
    "q46_gap_fill" -> (q46GapFill _, q46Sql),
    "q47_funnel" -> (q47Funnel _, q47Sql),
    "q48_retention_cohorts" -> (q48RetentionCohorts _, q48Sql),
    "q40_recursive_cte" -> (q40RecursiveCte _, q40Sql),
    "q44_rank_distribution" -> (q44RankDistribution _, q44Sql),
    "q42_unpivot" -> (q42Unpivot _, q42Sql),
    "q43_lateral_join" -> (q43LateralJoin _, q43Sql),
    "q33_exists_subquery" -> (q33ExistsSubquery _, q33Sql),
    "q34_not_exists_subquery" -> (q34NotExistsSubquery _, q34Sql),
    "q35_array_agg" -> (q35ArrayAgg _, q35Sql),
    "q19_approx_distinct" -> (q19ApproxDistinct _, q19Sql),
    "q20_cube" -> (q20Cube _, q20Sql),
    "q21_union_all" -> (q21UnionAll _, q21Sql),
    "q22_scalar_subquery" -> (q22ScalarSubquery _, q22Sql),
    "q23_pivot" -> (q23Pivot _, q23Sql),
    "q24_json_extract" -> (q24JsonExtract _, q24Sql),
    "q01_pricing_summary" -> (q01PricingSummary _, q01Sql),
    "q02_filter_project" -> (q02FilterProject _, q02Sql),
    "q03_join_agg" -> (q03JoinAgg _, q03Sql),
    "q04_broadcast_join" -> (q04BroadcastJoin _, q04Sql),
    "q05_nation_revenue" -> (q05NationRevenue _, q05Sql),
    "q06_forecast_revenue" -> (q06ForecastRevenue _, q06Sql),
    "q07_semi_join" -> (q07SemiJoin _, q07Sql),
    "q08_anti_join" -> (q08AntiJoin _, q08Sql),
    "q09_window_topk" -> (q09WindowTopK _, q09Sql),
    "q10_window_running" -> (q10WindowRunning _, q10Sql),
    "q11_sort_limit" -> (q11SortLimit _, q11Sql),
    "q12_except" -> (q12Except _, q12Sql),
    "q13_intersect" -> (q13Intersect _, q13Sql),
    "q14_rollup" -> (q14Rollup _, q14Sql),
    "q15_distinct_agg" -> (q15DistinctAgg _, q15Sql),
    "q16_scalar_fns" -> (q16ScalarFns _, q16Sql),
    "q17_case_agg" -> (q17CaseAgg _, q17Sql),
    "q18_events_hourly" -> (q18EventsHourly _, q18Sql),
    "q36_window_nav" -> (q36WindowNav _, q36Sql),
    "q37_string_fns" -> (q37StringFns _, q37Sql),
    "q38_date_arithmetic" -> (q38DateArithmetic _, q38Sql),
    "q39_higher_order" -> (q39HigherOrder _, q39Sql),
  )
}
