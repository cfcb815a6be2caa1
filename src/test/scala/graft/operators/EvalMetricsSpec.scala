package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exact tie-aware ROC-AUC (t24): hand-computed Mann-Whitney values,
  * including the tie conventions. */
class EvalMetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = EvalMetrics.rocAuc(rows.toDF("s", "l"), col("s"), col("l"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("perfectly separable → AUC = 1; reversed → 0") {
    val sep = Seq(1L -> false, 2L -> false, 3L -> true, 4L -> true)
    assert(auc(sep) == ((2L, 2L, 4L, 8L, 1000000L)))
    val rev = sep.map { case (s, l) => s -> !l }
    assert(auc(rev)._5 == 0L)
  }

  test("all scores tied → AUC = 0.5 (average-rank convention)") {
    val tied = Seq(7L -> true, 7L -> false, 7L -> true, 7L -> false)
    // 2U = pos·neg per the half-credit tie convention → AUC exactly 0.5
    assert(auc(tied) == ((2L, 2L, 1L, 4L, 500000L)))
  }

  test("mixed case matches the hand computation") {
    // scores: pos at 3, 1; neg at 2, 1
    // pairs: (3>2)=1, (3>1)=1, (1<2)=0, (1=1)=0.5 → U = 2.5, AUC = 0.625
    val rows = Seq(3L -> true, 1L -> true, 2L -> false, 1L -> false)
    val (np, nn, ns, u2, a) = auc(rows)
    assert((np, nn, ns) == ((2L, 2L, 3L)))
    assert(u2 == 5L, s"2U = $u2")
    assert(a == 625000L)
  }

  test("single-class input → counts report, auc_micro is NULL by contract") {
    import spark.implicits._
    val onlyPos = Seq(1L -> true, 2L -> true, 3L -> true)
    val r = EvalMetrics.rocAuc(onlyPos.toDF("s", "l"), col("s"), col("l"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 0L)))
    assert(r.isNullAt(4), "AUC undefined on one class → null, not a number")
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => ((i * 7 % 100).toLong, i % 3 == 0))
    val a1 = EvalMetrics.rocAuc(rows.toDF("s", "l"), col("s"), col("l"))
      .collect().head.toSeq
    val a2 = EvalMetrics.rocAuc(rows.toDF("s", "l").repartition(11),
      col("s"), col("l")).collect().head.toSeq
    assert(a1 == a2)
  }

  test("reliabilityBins: hand-computed bins, rates, and lift") {
    import spark.implicits._
    // scores 0..9 (range 10, 5 bins → width 2), label = score >= 6
    val rows = (0L to 9L).map(s => (s, s >= 6L))
    val out = EvalMetrics.reliabilityBins(rows.toDF("s", "l"),
      col("s"), col("l"), bins = 5).collect()
    assert(out.length == 5)
    // bin 3 = scores {6,7}: both positive; base rate 4/10
    val b3 = out(3)
    assert((b3.getLong(0), b3.getLong(1), b3.getLong(2)) == ((3L, 2L, 2L)))
    assert((b3.getLong(3), b3.getLong(4)) == ((6L, 7L)))
    assert(b3.getLong(5) == 1000000L)
    assert(b3.getLong(6) == 1000000L - 400000L)
    // bin 0 = scores {0,1}: none positive → rate 0, lift -400000
    assert(out(0).getLong(5) == 0L && out(0).getLong(6) == -400000L)
    // degenerate all-one-score input → a single bin 0 holding everything
    val one = EvalMetrics.reliabilityBins(
      Seq((7L, true), (7L, false)).toDF("s", "l"), col("s"), col("l"))
      .collect()
    assert(one.length == 1 && one.head.getLong(0) == 0L &&
      one.head.getLong(1) == 2L && one.head.getLong(5) == 500000L)
  }

  test("reliabilityBins invariants: bins partition rows, ranges ordered, " +
    "partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 4000).map(i =>
      (((i * 2654435761L) % 977L) - 488L, i % 7 < 3))
    val df = rows.toDF("s", "l")
    val out = EvalMetrics.reliabilityBins(df, col("s"), col("l"), bins = 10)
      .collect()
    assert(out.map(_.getLong(1)).sum == 4000L) // Σn = total
    assert(out.map(_.getLong(2)).sum == rows.count(_._2).toLong) // Σn_pos
    // equal-width bins are ordered, disjoint score ranges
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(0) < b.getLong(0))
      assert(a.getLong(4) < b.getLong(3),
        s"bin ${a.getLong(0)} hi ${a.getLong(4)} overlaps " +
          s"bin ${b.getLong(0)} lo ${b.getLong(3)}")
    case _ => ()
    }
    val again = EvalMetrics.reliabilityBins(df.repartition(7), col("s"),
      col("l"), bins = 10).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("prThresholds: hand-computed grid, precision/recall/F1") {
    import spark.implicits._
    // scores 0..7 (range 8), label = score >= 4 → 4 positives.
    // cuts=4 → thresholds 0, 2, 4, 6.
    val rows = (0L to 7L).map(s => (s, s >= 4L))
    val out = EvalMetrics.prThresholds(rows.toDF("s", "l"),
      col("s"), col("l"), cuts = 4).collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L, 6L))
    // t=0: all 8 kept, 4 tp → p=500000, r=1e6, f1 = 2pr/(p+r)
    val t0 = out(0)
    assert((t0.getLong(2), t0.getLong(3)) == ((8L, 4L)))
    assert(t0.getLong(4) == 500000L && t0.getLong(5) == 1000000L)
    assert(t0.getLong(6) ==
      2L * 500000L * 1000000L / (500000L + 1000000L))
    // t=4: exactly the positives → perfect filter
    val t4 = out(2)
    assert((t4.getLong(2), t4.getLong(3)) == ((4L, 4L)))
    assert(t4.getLong(4) == 1000000L && t4.getLong(5) == 1000000L &&
      t4.getLong(6) == 1000000L)
    // t=6: keeps {6,7}, both positive → p=1e6, r=500000
    val t6 = out(3)
    assert((t6.getLong(2), t6.getLong(3)) == ((2L, 2L)))
    assert(t6.getLong(4) == 1000000L && t6.getLong(5) == 500000L)
    // no positives anywhere → recall/f1 NULL, precision defined
    val neg = EvalMetrics.prThresholds(
      Seq((1L, false), (2L, false)).toDF("s", "l"), col("s"), col("l"),
      cuts = 2).collect()
    assert(neg.forall(r => r.isNullAt(5) && r.isNullAt(6)))
    assert(neg.forall(_.getLong(4) == 0L))
  }

  test("agreementKappa: hand-computed 2x2 tables, sign, and degenerates") {
    import spark.implicits._
    def kap(rows: Seq[(Boolean, Boolean)]) =
      EvalMetrics.agreementKappa(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
    // classic example: n=100, n11=20, n00=45, n01=15, n10=20
    // po = 0.65; pe = (40*35 + 60*65)/10000 = 0.53; kappa = 12/47
    val rows = Seq.fill(45)((false, false)) ++ Seq.fill(15)((false, true)) ++
      Seq.fill(20)((true, false)) ++ Seq.fill(20)((true, true))
    val r = kap(rows)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((100L, 45L, 15L, 20L, 20L)))
    assert(r.getLong(5) == 650000L && r.getLong(6) == 530000L)
    assert(r.getLong(7) == 12L * 1000000L / 47L) // 255319
    // perfect agreement → kappa = 1e6
    assert(kap(Seq((true, true), (false, false))).getLong(7) == 1000000L)
    // systematic DISagreement → negative kappa, truncated toward zero
    val neg = kap(Seq.fill(5)((true, false)) ++ Seq.fill(5)((false, true)))
    assert(neg.getLong(7) == -1000000L, neg.toString)
    // both raters constant → pe = 1, kappa undefined → NULL
    assert(kap(Seq.fill(4)((true, true))).isNullAt(7))
  }

  test("balancedAccuracy: hand-computed rates, skew-proof, degenerates") {
    import spark.implicits._
    def bacc(rows: Seq[(Boolean, Boolean)]) =
      EvalMetrics.balancedAccuracy(rows.toDF("p", "l"), col("p"), col("l"))
        .collect().head
    // pred ⊥ skew: 90 TN, 5 FP, 4 FN, 1 TP — raw accuracy .91 looks
    // great; TPR = 1/5, TNR = 90/95 → bacc exposes the dead filter
    val r = bacc(Seq.fill(90)((false, false)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(4)((false, true)) ++ Seq.fill(1)((true, true)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((100L, 90L, 4L, 5L, 1L)))
    assert(r.getLong(5) == 200000L) // TPR = 1/5
    assert(r.getLong(6) == 1000000L * 90L / 95L) // 947368
    assert(r.getLong(7) == (200000L + 947368L) / 2L)
    assert(r.getLong(8) == 200000L + 947368L - 1000000L)
    // perfect filter → all three at ceiling
    val p = bacc(Seq((true, true), (false, false)))
    assert(p.getLong(7) == 1000000L && p.getLong(8) == 1000000L)
    // absent positive class → TPR, bacc, J all NULL, TNR defined
    val n = bacc(Seq.fill(3)((false, false)))
    assert(n.isNullAt(5) && n.isNullAt(7) && n.isNullAt(8) &&
      n.getLong(6) == 1000000L)
  }

  test("rankingMetrics is partitioning-invariant") {
    import spark.implicits._
    val run = (1L to 20L).flatMap(q =>
      (1L to 10L).map(r => (q, q * 100 + (r * 7 % 11), r)))
      .toDF("qid", "did", "rank")
    val rels = (1L to 20L).flatMap(q =>
      (0L to 30L).filter(_ % 3 == 0).map(d => (q, q * 100 + d)))
      .toDF("qid", "did")
    val a = EvalMetrics.rankingMetrics(run, "qid", "did", "rank",
      rels, "qid", "did", k = 10).orderBy("qid").collect().map(_.toSeq).toSeq
    val b = EvalMetrics.rankingMetrics(run.repartition(9), "qid", "did",
      "rank", rels.repartition(5), "qid", "did", k = 10)
      .orderBy("qid").collect().map(_.toSeq).toSeq
    assert(a == b && a.length == 20)
  }

  test("rankingMetrics: hand-computed MRR / recall / nDCG, integer-exact") {
    import spark.implicits._
    val w = EvalMetrics.ndcgWeights(3)
    // w(1)=10⁹, w(2)=⌊10⁹/log2(3)⌋, w(3)=⌊10⁹/2⌋
    assert(w(0) == 1000000000L && w(2) == 500000000L)
    assert(w(1) == 630929753L) // 1e9 / 1.584962500721156
    // run: q1 ranks docs 10,11,12; q2 ranks 20,21,22; q3 ranks 30,31,32
    val run = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L))
      .toDF("qid", "did", "rank")
    // q1: rel = {11, 99} → hit at rank 2 only; n_rel = 2
    // q2: rel = {20, 21, 22, 23} → hits at 1,2,3; n_rel = 4
    // q3: no judged docs at all
    val rels = Seq((1L, 11L), (1L, 99L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L))
      .toDF("qid", "did")
    val out = EvalMetrics.rankingMetrics(run, "qid", "did", "rank",
      rels, "qid", "did", k = 3)
      .orderBy("qid").collect()
    // q1: rr = 1e6 div 2; recall = 1·1e6 div 2; dcg = w(2),
    //     idcg = w(1)+w(2) (n_rel=2) → ndcg = w2·1e6 div (w1+w2)
    val q1 = out(0)
    assert(q1.getLong(1) == 2L && q1.getLong(2) == 3L && q1.getLong(3) == 1L)
    assert(q1.getLong(4) == 500000L && q1.getLong(5) == 500000L)
    assert(q1.getLong(6) == w(1) * 1000000L / (w(0) + w(1)))
    // q2: all 3 retrieved relevant; n_rel=4 → recall = 750000;
    //     dcg = w1+w2+w3, idcg = prefix(min(4,3)) = w1+w2+w3 → ndcg = 1e6
    val q2 = out(1)
    assert(q2.getLong(3) == 3L && q2.getLong(4) == 1000000L)
    assert(q2.getLong(5) == 750000L && q2.getLong(6) == 1000000L)
    // q3: unjudged query → rr 0, recall/ndcg NULL (undefined, not 0)
    val q3 = out(2)
    assert(q3.getLong(1) == 0L && q3.getLong(3) == 0L && q3.getLong(4) == 0L)
    assert(q3.isNullAt(5) && q3.isNullAt(6))
  }
}
