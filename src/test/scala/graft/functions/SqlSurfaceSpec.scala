package graft.functions

import java.io.{File, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.XlsxWriter

/** The pure-SQL surface: registered custom functions and `CREATE TABLE …
  * USING excel` DDL both work, so a SQL-only user has full access. */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-sqlwh").toFile.getAbsolutePath)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("registered functions are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT fnv1a64('a') AS h, simhash64('the quick brown fox jumps') AS s, " +
        "size(minhash128('one two three four')) AS m").collect().head
    assert(r.getLong(0) == 0xaf63dc4c8601ec8cL) // public FNV-1a vector
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 128)
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same, " +
        "cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth, " +
        "cosine_sim(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS zero").collect().head
    assert(c.getDouble(0) == 1.0 && c.getDouble(1) == 0.0 && c.isNullAt(2))
  }

  test("ShingleExplode generator matches explode(shingleSet) row for row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b"),            // fewer tokens than k → single joined shingle
      (3L, ""),               // empty → no rows
      (4L, "x y z x y z x y z"), // repeated shingles → distinct only
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val viaGenerator = docs.select($"id",
      graft.functions.TextExpressions.shingleExplode($"text", 3))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val viaArray = docs.select($"id",
      graft.functions.TextExpressions.shingleSet($"text", 3).as("sh"))
      .select($"id", explode($"sh").as("shingle"), size($"sh").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(viaGenerator == viaArray)
    assert(viaGenerator.nonEmpty)
  }

  test("wrong arity and wrong types are rejected at analysis") {
    GraftFunctions.register(spark)
    val e1 = intercept[Exception](spark.sql("SELECT fnv1a64()").collect())
    assert(e1.getMessage.contains("exactly 1 argument"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("SELECT fnv1a64('a', 'b')").collect())
    assert(e2.getMessage.contains("exactly 1 argument"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql("SELECT simhash64(42)").collect())
    assert(e3.getMessage.toLowerCase.contains("string"), e3.getMessage)
    val e4 = intercept[Exception](
      spark.sql("SELECT emb_lsh_bucket(array(1, 2))").collect())
    assert(e4.getMessage.contains("array<float>"), e4.getMessage)
  }

  test("CREATE TABLE ... USING excel DDL round-trip") {
    val dir = Files.createTempDirectory("graft-ddl").toFile
    val f = new File(dir, "t.xlsx")
    val w = new XlsxWriter(new FileOutputStream(f))
    w.writeRow(Seq("id", "name"))
    w.writeRow(Seq(1L, "Ada"))
    w.writeRow(Seq(2L, "Grace"))
    w.close()

    spark.sql(
      s"""CREATE TABLE excel_ddl (id INT, name STRING) USING excel
         |OPTIONS (path '${f.getAbsolutePath}')""".stripMargin)
    try {
      val rows = spark.sql(
        "SELECT name FROM excel_ddl WHERE id = 2").collect().map(_.getString(0))
      assert(rows.toSeq == Seq("Grace"))
    } finally spark.sql("DROP TABLE excel_ddl")
  }
}
