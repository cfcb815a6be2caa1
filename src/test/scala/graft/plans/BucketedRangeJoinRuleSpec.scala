package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions optimizer rule: a pure range join planned
  * through plain SQL must become a bucketed equi-join (no BNLJ/cartesian)
  * when the width conf is set, with the result multiset unchanged —
  * including boundary rows, overlapping intervals, and null bounds. */
class BucketedRangeJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  // extensions bind at session CREATION: a leftover session from an earlier
  // suite in the same JVM would be returned by getOrCreate without the rule
  // installed, so tear any such session down first
  private lazy val spark = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.ui.enabled", "false")
    // keep the small side from broadcasting so the unrewritten plan is a
    // genuine BNLJ and the rewrite's effect is visible
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def setup(): Unit = {
    import spark.implicits._
    spark.range(0, 1000).select((col("id") * 1.0).as("v"), col("id"))
      .createOrReplaceTempView("vals")
    Seq[(String, Option[Double], Option[Double])](
      ("a", Some(0.0), Some(100.0)),
      ("b", Some(100.0), Some(250.0)), // overlaps 'a' at exactly 100.0
      ("c", Some(500.0), Some(500.0)), // degenerate single-point interval
      ("d", None, Some(900.0)),        // null lo: no match
      ("e", Some(950.0), Some(2000.0))
    ).toDF("name", "lo", "hi").createOrReplaceTempView("bands")
  }

  private val sql =
    """SELECT id, name FROM vals JOIN bands
      |ON v >= lo AND v <= hi""".stripMargin

  test("rule rewrites the BNLJ into an equi join with identical results") {
    setup()
    spark.conf.unset(BucketedRangeJoinRule.WidthConf)
    val plain = spark.sql(sql)
    val basePlan = plain.queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin") ||
      basePlan.contains("CartesianProduct"),
      s"baseline should degenerate without the rule:\n$basePlan")
    val expected = plain.collect().map(r => (r.getLong(0), r.getString(1))).toSet

    spark.conf.set(BucketedRangeJoinRule.WidthConf, "64.0")
    try {
      val rewritten = spark.sql(sql)
      val p = rewritten.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not fire:\n$p")
      assert(p.contains("Generate"), p)
      val got = rewritten.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expected)
      assert(got.contains((100L, "a")) && got.contains((100L, "b")), "boundary overlap")
      assert(got.contains((500L, "c")), "degenerate interval")
      assert(!got.exists(_._2 == "d"), "null bound must not match")
    } finally spark.conf.unset(BucketedRangeJoinRule.WidthConf)
  }

  test("inverted interval (lo > hi) yields zero rows, not an exception") {
    import spark.implicits._
    spark.range(0, 100).select((col("id") * 1.0).as("v"), col("id"))
      .createOrReplaceTempView("vals_inv")
    Seq(("ok", 10.0, 20.0), ("inverted", 90.0, 5.0))
      .toDF("name", "lo", "hi").createOrReplaceTempView("bands_inv")
    val q = """SELECT id, name FROM vals_inv JOIN bands_inv
              |ON v >= lo AND v <= hi""".stripMargin
    spark.conf.set(BucketedRangeJoinRule.WidthConf, "8.0")
    try {
      val rewritten = spark.sql(q)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
        "rule should have fired")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // Sequence(start > stop, step=1) would throw; the guard must instead
      // produce the BETWEEN semantics: inverted interval matches nothing.
      assert(got == (10L to 20L).map((_, "ok")).toSet)
    } finally spark.conf.unset(BucketedRangeJoinRule.WidthConf)
  }

  test("rule leaves equi joins and non-range conditions alone") {
    setup()
    spark.conf.set(BucketedRangeJoinRule.WidthConf, "64.0")
    try {
      // equality conjunct present → not a pure range join → untouched
      val mixed = spark.sql(
        "SELECT id, name FROM vals JOIN bands ON v = lo AND v <= hi")
      assert(!mixed.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      // strict inequality (not BETWEEN shape) → untouched
      val strict = spark.sql(
        "SELECT id, name FROM vals JOIN bands ON v > lo AND v <= hi")
      assert(!strict.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    } finally spark.conf.unset(BucketedRangeJoinRule.WidthConf)
  }

  test("extensions also inject the SQL function surface") {
    // one spark.sql.extensions line gives a cluster the functions too —
    // no imperative GraftFunctions.register call anywhere in this session
    val r = spark.sql(
      "SELECT fnv1a64('hello') AS fp, cosine_sim(array(1.0F, 0.0F), " +
        "array(1.0F, 0.0F)) AS cos").collect()(0)
    // public FNV-1a64 test vector for "hello"
    assert(r.getLong(0) == 0xa430d84680aabd0bL)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }
}
