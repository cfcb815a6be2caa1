package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Term burstiness (t27): the scaled Fano factor must match the
  * hand-computed variance-to-mean ratio with zero-docs included. */
class BurstinessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("burst_micro equals the exact integer Fano factor") {
    import spark.implicits._
    // 4 docs. "spark": counts (3, 0, 0, 1) → N=4, tf=4, Σc²=10:
    //   burst = (4·10 − 16)·1e6 / (4·4) = 24e6/16 = 1_500_000.
    // "the": counts (1, 1, 1, 1) → (4·4 − 16)/16 = 0 (perfectly even).
    // "a": counts (2, 2, 0, 0) → (4·8 − 16)·1e6 / (4·4) = 1_000_000.
    val docs = Seq(
      "spark spark spark the a a",
      "the a a",
      "the",
      "spark the").toDF("text")
    val out = TextAnalysis.burstiness(docs, "text", minDf = 1L, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("spark") == 1500000L, out.toString)
    assert(out("the") == 0L)
    assert(out("a") == 1000000L)
  }

  test("minDf filters and topK bounds deterministically") {
    import spark.implicits._
    val docs = ((0 until 50).map(i => s"common rare$i") :+ "common")
      .toDF("text").repartition(7)
    val out = TextAnalysis.burstiness(docs, "text", minDf = 2L, topK = 5)
      .collect()
    // every rare$i has df=1 → filtered; only "common" (df=51) survives
    assert(out.map(_.getString(0)).toSeq == Seq("common"))
    val capped = TextAnalysis.burstiness(docs, "text", minDf = 1L, topK = 5)
      .collect()
    assert(capped.length == 5)
    // rare$i: N=51, tf=1, Σc² = 1 → (51 − 1)·1e6/51 = 980392, far above
    // common's 0 (present once in every doc). Ties break word ASC
    // (lexicographic: rare0 < rare1 < rare10 < …)
    assert(capped.map(_.getString(0)).toSeq ==
      Seq("rare0", "rare1", "rare10", "rare11", "rare12"),
      capped.mkString(","))
  }

  test("vocabCoverage: argmin prefix and exact mass per target") {
    import spark.implicits._
    // counts: a=4 b=2 c=1 d=1, total 8, vocab 4
    val docs = Seq("a a a a", "b b c d").toDF("text")
    val out = TextAnalysis.vocabCoverage(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 50%: cum(a)=4 ≥ 4 → 1 type, mass 4/8 = 500000
    assert(out(50L) == (4L, 8L, 1L, 500000L), out.toString)
    // 90%: need cum·100 ≥ 720 → cum 8 → all 4 types, full mass
    assert(out(90L) == (4L, 8L, 4L, 1000000L), out.toString)
    assert(out(99L) == (4L, 8L, 4L, 1000000L), out.toString)
  }

  test("t29 effective tokens: discount bounded and real on the fixture") {
    val out = graft.queries.TextQueries
      .t29EffectiveTokens(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    var anyDiscount = false
    out.foreach { r =>
      val (raw, eff, ret) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(eff <= raw * 1000000L && eff > 0, r.toString)
      assert(ret <= 1000000L && ret > 0, r.toString)
      if (eff < raw * 1000000L) anyDiscount = true
    }
    // the fixture plants near-dup clusters — some source must discount
    assert(anyDiscount, out.mkString(","))
  }
}
