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

  test("cross-band bkey collision is NOT a candidate (band is part of the key)") {
    import spark.implicits._
    // r13 VERDICT item 2: an oracle band-alias bug once collapsed the 16
    // bands, making the candidate join effectively key on bkey alone. Pin
    // the operator's contract adversarially: a history index carrying the
    // batch doc's exact bkey VALUES at shifted band positions must produce
    // zero candidates — and to prove a leaked candidate would have been
    // caught, the planted history signature agrees 128/128 with the batch
    // doc (any candidate leak flips status to dup_of_history).
    val batch = Seq((100L, mkDoc(9, 60))).toDF("doc_id", "text")
    val batchSigs = Dedup.minhashSignatures(batch, "doc_id", "text")
    val keys = Dedup.nearDupBandKeys(batchSigs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(keys.map(_._2).distinct.length == 16, "expect 16 true bands")
    val shifted = keys.map { case (_, band, bkey) =>
      (999L, (band + 1) % 16, bkey) }.toSeq.toDF("doc_id", "band", "bkey")
    val storeSigs = batchSigs.select(lit(999L).as("doc_id"), col("sig"))
    val collided = Dedup.incrementalNearDup(storeSigs, batch, "doc_id",
      "text", storeIndex = Some(shifted)).collect()
    assert(collided.length == 1 && collided.head.getString(1) == "unique",
      collided.mkString(";"))
    // control: the SAME index at the true band positions → dup_of_history
    val aligned = keys.map { case (_, band, bkey) => (999L, band, bkey) }
      .toSeq.toDF("doc_id", "band", "bkey")
    val hit = Dedup.incrementalNearDup(storeSigs, batch, "doc_id", "text",
      storeIndex = Some(aligned)).collect()
    assert(hit.length == 1 && hit.head.getString(1) == "dup_of_history" &&
      hit.head.getLong(2) == 999L, hit.mkString(";"))
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

  test("bucketCap bounds a hot bucket's fan-out sub-quadratically, " +
      "verdicts stay correct") {
    import spark.implicits._
    // 1000 identical docs: every doc lands in the SAME bucket in all 16
    // bands — the boilerplate worst case. Uncapped that is 999·1000/2
    // candidate pairs; capped at 8 residents it is ≤ 8·999.
    val boiler = mkDoc(11, 40)
    val batch = (0 until 1000).map(i => (100L + i, boiler))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(batch, "doc_id", "text")
    val index = Dedup.nearDupBandKeys(sigs).localCheckpoint()
    val uncapped = Dedup.inBatchCandidates(index, Int.MaxValue).count()
    val capped = Dedup.inBatchCandidates(index, 8).count()
    assert(uncapped == 999L * 1000 / 2, s"uncapped=$uncapped")
    assert(capped <= 8L * 999, s"capped=$capped not sub-quadratic")
    // min-id docs stay resident, so every dup is still caught: 1 unique
    // (the lowest id) + 999 dup_in_batch all pointing at it
    val store = Dedup.minhashSignatures(
      Seq((1L, mkDoc(5, 40))).toDF("doc_id", "text"), "doc_id", "text")
    val out = Dedup.incrementalNearDup(store, batch, "doc_id", "text",
        bucketCap = 8)
      .groupBy("status").agg(count(lit(1)).as("n"),
        min("dup_of").as("lo"), max("dup_of").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("unique")._1 == 1L)
    assert(out("dup_in_batch") == ((999L, Some(100L), Some(100L))))
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
