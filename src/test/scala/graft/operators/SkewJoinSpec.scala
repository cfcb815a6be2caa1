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
}
