package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter contract tests: no false negatives ever, bit packing
  * stays inside the 60-bit word layout, and the candidate set is exactly
  * reproducible (determinism is what the d18 oracle relies on). */
class BloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def members = (1 to 300).map(i => s"member gram $i")
  private def strangers = (1 to 300).map(i => s"stranger gram $i")

  test("no false negatives: every member is a candidate") {
    import spark.implicits._
    val filter = Bloom.build(members.toDF("gram"), "gram")
    val probe = (members ++ strangers).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "gram")
    val cand = Bloom.candidates(probe, "id", "gram", filter)
      .select("gram").as[String].collect().toSet
    assert(members.toSet.subsetOf(cand),
      s"missing members: ${members.toSet -- cand}")
  }

  test("candidate set is deterministic across runs") {
    import spark.implicits._
    val filter = Bloom.build(members.toDF("gram"), "gram")
    val probe = (members ++ strangers).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "gram")
    val r1 = Bloom.candidates(probe, "id", "gram", filter)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val r2 = Bloom.candidates(probe.repartition(7), "id", "gram", filter)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(r1 == r2)
  }

  test("prune: no false negatives, rows and columns pass through intact") {
    import spark.implicits._
    val keys = (1L to 200L)
    val filter = Bloom.build(
      keys.map(_.toString).toDF("k"), "k")
    val fact = (1L to 1000L).map(k => (k, s"payload_$k", k * 2.5))
      .toDF("key", "payload", "value")
    val pruned = Bloom.prune(fact, "key", filter)
    assert(pruned.columns.toSeq == Seq("key", "payload", "value"),
      "prune must not add or drop columns")
    val kept = pruned.select("key").as[Long].collect().toSet
    assert(keys.toSet.subsetOf(kept), "bloom dropped a true member")
    // duplicate fact rows survive (no distinct in the prune path)
    val dup = fact.union(fact)
    assert(Bloom.prune(dup, "key", filter).count() ==
      2 * pruned.count())
  }

  test("prune + exact semi join equals the plain semi join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = (1L to 150L).toDF("dk")
    val fact = (1L to 2000L).map(k => (k, k % 7)).toDF("fk", "v")
    val filter = Bloom.build(dim.select(col("dk").cast("string").as("k")), "k")
    val viaBloom = Bloom.prune(fact, "fk", filter)
      .join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaBloom == plain)
  }

  test("fast pair: no false negatives, bloom + exact join equals plain join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = (1L to 150L).toDF("dk")
    val fact = (1L to 2000L).map(k => (k, k % 7)).toDF("fk", "v")
    val filter = Bloom.buildFast(dim, "dk")
    val kept = Bloom.pruneFast(fact, "fk", filter)
      .select("fk").as[Long].collect().toSet
    assert((1L to 150L).toSet.subsetOf(kept), "fast bloom dropped a member")
    val viaBloom = Bloom.pruneFast(fact, "fk", filter)
      .join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaBloom == plain)
  }

  test("word layout: indexes and bits stay inside m = 2^16 / 60-bit words") {
    import spark.implicits._
    val filter = Bloom.build(members.toDF("gram"), "gram").collect()
    assert(filter.nonEmpty)
    filter.foreach { r =>
      val (w, bits) = (r.getLong(0), r.getLong(1))
      assert(w >= 0 && w <= (Bloom.MBits - 1) / Bloom.WordBits)
      assert(bits != 0L && (bits & ~((1L << Bloom.WordBits) - 1)) == 0L,
        s"bits outside 60-bit word at word_idx=$w")
    }
  }
}
