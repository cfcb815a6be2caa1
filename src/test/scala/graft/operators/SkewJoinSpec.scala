package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    // 10k rows, 95% on one hot key
    val left = spark.range(10000)
      .select($"id", when($"id" % 20 === 0, "cold").otherwise("hot").as("k"))
    val right = Seq(("hot", 1.0), ("cold", 2.0), ("absent", 3.0)).toDF("k", "w")

    val plain = left.join(right, "k").select($"id", $"w")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k").select($"id", $"w")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt actually spreads the hot key across partitions") {
    import spark.implicits._
    val left = spark.range(1000).select($"id", lit("hot").as("k"))
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(8)))
    val saltCount = salted.select("__salt").distinct().count()
    assert(saltCount == 8, s"expected 8 distinct salts, got $saltCount")
  }

  test("skew audit: hand-checked census on a known key distribution") {
    import spark.implicits._
    // counts per key: a=50, b=4, c=4, d=2 → sorted [2,4,4,50]
    val rows = Seq.fill(50)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(2)("d")
    val r = SkewJoin.skewAudit(rows.toDF("k"), "k").collect().head
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("total_rows") == 60L)
    assert(r.getAs[Long]("max_rows") == 50L)
    // percentile_disc(0.5): smallest value with cume_dist >= 0.5 → 4
    assert(r.getAs[Long]("median_rows") == 4L)
    // ⌊10⁶·50/4⌋
    assert(r.getAs[Long]("skew_micro") == 12500000L)
    // only a (50) exceeds 10×median = 40
    assert(r.getAs[Long]("heavy_keys") == 1L)
    // ⌈50·4/60⌉ = ⌈3.33⌉ = 4 (integer form: (200+59) div 60)
    assert(r.getAs[Long]("salt_factor") == 4L)
  }

  test("skew audit: balanced key reports salt_factor 1 and no heavies") {
    import spark.implicits._
    val df = spark.range(100).select(($"id" % 10).as("k"))
    val r = SkewJoin.skewAudit(df, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 10L)
    assert(r.getAs[Long]("max_rows") == 10L)
    assert(r.getAs[Long]("median_rows") == 10L)
    assert(r.getAs[Long]("skew_micro") == 1000000L)
    assert(r.getAs[Long]("heavy_keys") == 0L)
    assert(r.getAs[Long]("salt_factor") == 1L)
  }
}
