package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the cross-gate shared-prep registry: memoization identity,
  * drain survival (the property Bench.drainLeaks depends on — dropping a
  * localCheckpoint's blocks is unrecoverable), and session-scoped keys. */
class SharedPrepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("cached memoizes per key: same key same instance, new key new build") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = SharedPrep.cached(spark, "sps-key1")(build())
    val b = SharedPrep.cached(spark, "sps-key1")(build())
    val c = SharedPrep.cached(spark, "sps-key2")(build())
    assert(a eq b, "same (session, key) must return the cached instance")
    assert(!(a eq c), "a different key must build fresh")
    assert(builds == 2, s"expected 2 builds, got $builds")
  }

  test("cached is NEST-safe: a builder may resolve another cached key") {
    import spark.implicits._
    // the tradeGraph-on-tradePairs shape; a ConcurrentHashMap
    // computeIfAbsent spelling threw 'Recursive update' here whenever
    // the two keys shared a bin (per-JVM coin flip — it silently killed
    // g01/g03 in two full bench runs)
    var innerBuilds = 0
    def inner() = SharedPrep.cached(spark, "sps-nest-inner") {
      innerBuilds += 1; Seq(1L, 2L).toDF("x")
    }
    // many outer keys so at least one collides with the inner's bin
    val outs = (0 until 64).map { i =>
      SharedPrep.cached(spark, s"sps-nest-outer-$i") {
        inner().select(
          (org.apache.spark.sql.functions.col("x") + i).as("y"))
      }
    }
    assert(innerBuilds == 1, "inner built once, resolved from every nest")
    assert(outs(63).agg(org.apache.spark.sql.functions.sum("y"))
      .head().getLong(0) == 129L) // (1+63)+(2+63)
  }

  test("checkpointShared survives a Bench-style drain of unkept RDDs") {
    import spark.implicits._
    val sc = spark.sparkContext
    val shared = SharedPrep.checkpointShared(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // an UNREGISTERED leak, as a gate would leave behind
    val leak = Seq(9L).toDF("id").localCheckpoint()
    assert(leak.count() == 1)
    // the exact drain Bench runs between queries
    sc.getPersistentRDDs
      .filterNot { case (id, _) => SharedPrep.isKept(spark, id) }
      .values.foreach(_.unpersist(blocking = true))
    // shared blocks survive: the checkpointed data is still readable
    assert(shared.count() == 2)
    assert(shared.select("v").orderBy("id").collect().map(_.getString(0))
      .toSeq == Seq("a", "b"))
    // and the drain did drop the unregistered leak's blocks
    assert(sc.getPersistentRDDs.values
      .forall(r => SharedPrep.isKept(spark, r.id)),
      "only registered shared RDDs may remain persisted after a drain")
  }
}
