package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental near-dup store probe (d20): batch docs classify against a
  * persisted signature store without history text ever being re-read. */
class IncrementalNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mkDoc(seed: Int, words: Int): String =
    (0 until words).map(i => s"w${(seed * 31 + i * 7) % 97}x$i").mkString(" ")

  test("statuses: dup_of_history, dup_in_batch, unique, and empty docs") {
    import spark.implicits._
    val long = mkDoc(1, 60)
    val longTweaked = long.split(" ").updated(59, "changed").mkString(" ")
    val hist = Seq(
      (1L, long), // history original
      (2L, mkDoc(2, 60))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, longTweaked), // near-dup of history doc 1 (59/60 words shared)
      (11L, mkDoc(3, 60)), // unique, first occurrence
      (12L, mkDoc(3, 60)), // exact dup of 11 → dup_in_batch
      (13L, mkDoc(4, 50)), // unique
      (14L, "   ")).toDF("doc_id", "text") // empty → unique, null est
    val store = Dedup.minhashSignatures(hist, "doc_id", "text")
    val out = Dedup.incrementalNearDup(store, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(byId(10L)._1 == "dup_of_history" && byId(10L)._2.contains(1L),
      byId(10L).toString)
    assert(byId(11L)._1 == "unique")
    assert(byId(12L)._1 == "dup_in_batch" && byId(12L)._2.contains(11L))
    assert(byId(12L)._3.contains(1.0)) // identical text → full agreement
    assert(byId(13L)._1 == "unique" && byId(13L)._3.isEmpty)
    assert(byId(14L)._1 == "unique" && byId(14L)._3.isEmpty)
    assert(out.length == 5, "every batch row classified, empties included")
  }

  test("history partner wins over an in-batch partner; lowest id on ties") {
    import spark.implicits._
    val d = mkDoc(7, 40)
    val hist = Seq((5L, d), (3L, d)).toDF("doc_id", "text")
    val batch = Seq((20L, d), (21L, d)).toDF("doc_id", "text")
    val store = Dedup.minhashSignatures(hist, "doc_id", "text")
    val out = Dedup.incrementalNearDup(store, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // both batch docs match BOTH history docs and each other: history wins,
    // and the lowest history id (3) is the canonical partner
    assert(out(20L) == ("dup_of_history", 3L))
    assert(out(21L) == ("dup_of_history", 3L))
    // a persisted bucket index (the production contract) yields the same
    // verdicts without re-banding the signature store
    val idx = Dedup.nearDupBandKeys(store).localCheckpoint()
    val viaIndex = Dedup.incrementalNearDup(store, batch, "doc_id", "text",
        storeIndex = Some(idx))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(viaIndex == out)
  }

  test("store probe never touches history text (API holds only signatures)") {
    import spark.implicits._
    val hist = Seq((1L, mkDoc(1, 30))).toDF("doc_id", "text")
    val store = Dedup.minhashSignatures(hist, "doc_id", "text")
      .localCheckpoint() // sever lineage: the persisted-store stand-in
    assert(store.columns.toSeq == Seq("doc_id", "sig"))
    val batch = Seq((10L, mkDoc(9, 30))).toDF("doc_id", "text")
    val plan = Dedup.incrementalNearDup(store, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // candidate joins are equi-joins, never cartesian
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"degenerated:\n$plan")
  }
}
