package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-candidate counting (t23): pair counts must match the
  * hand-computed inner loop of a reference BPE trainer. */
class BpePairSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pair counts are frequency-weighted, once per position") {
    import spark.implicits._
    // word freqs: "low" ×3, "lower" ×2, "aaa" ×1, "x" ×1 (no pairs)
    val docs = Seq(
      "low low lower",
      "low lower aaa x").toDF("text")
    val out = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    val m = out.toMap
    // "l o": in low(3) + lower(2) = 5, from 2 distinct words
    assert(m("l o") == (5L, 2L), m.toString)
    assert(m("o w") == (5L, 2L))
    // "w e"/"e r": lower only
    assert(m("w e") == (2L, 1L))
    assert(m("e r") == (2L, 1L))
    // "a a" occurs TWICE per "aaa" occurrence (once per position)
    assert(m("a a") == (2L, 1L))
    // ranking: the head row is the next merge — (cnt DESC, pair ASC)
    assert(out.head._1 == "l o", out.map(_._1).mkString(","))
    // single-char words contribute nothing
    assert(!m.keySet.exists(_.contains("x")))
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val docs = (0 until 500).map(i => s"tok$i alpha beta alpha").toDF("text")
    val a = TextAnalysis.bpePairCounts(docs, "text").collect().toSeq
    val b = TextAnalysis.bpePairCounts(docs.repartition(7), "text")
      .collect().toSeq
    assert(a == b)
  }
}
