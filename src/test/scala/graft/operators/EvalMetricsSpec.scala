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
}
