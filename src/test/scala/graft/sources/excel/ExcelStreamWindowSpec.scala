package graft.sources.excel

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Watermark + windowed aggregation ON TOP of the excel micro-batch source:
  * the reference can only discover files (SURVEY.md §2.2 last row); with a
  * real MicroBatchStream the whole Structured Streaming operator surface
  * composes for free — this spec proves it end-to-end. */
class ExcelStreamWindowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("windowed count with watermark over streaming excel files") {
    val dir = Files.createTempDirectory("graft-win-in").toFile
    val ckpt = Files.createTempDirectory("graft-win-ck").toFile

    def writeEvents(name: String, rows: Seq[(LocalDateTime, String)]): Unit = {
      val w = new XlsxWriter(new FileOutputStream(new File(dir, name)))
      w.writeRow(Seq("ts", "kind"))
      rows.foreach { case (t, k) => w.writeRow(Seq(t, k)) }
      w.close()
    }
    val base = LocalDateTime.of(2024, 5, 1, 10, 0, 0)
    writeEvents("batch1.xlsx", Seq(
      (base.plusMinutes(1), "a"), (base.plusMinutes(2), "a"),
      (base.plusMinutes(6), "b")))

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("kind", StringType)))
    val agg = spark.readStream.format("excel").schema(schema)
      .load(dir.getAbsolutePath)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("kind"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val rows1 = spark.table("win_out")
        .select(col("window.start").cast("string"), col("kind"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows1 == Set(
        ("2024-05-01 10:00:00", "a", 2L),
        ("2024-05-01 10:05:00", "b", 1L)))

      // second file lands: counts update incrementally
      writeEvents("batch2.xlsx", Seq((base.plusMinutes(3), "a")))
      q.processAllAvailable()
      val rows2 = spark.table("win_out")
        .select(col("window.start").cast("string"), col("kind"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows2.contains(("2024-05-01 10:00:00", "a", 3L)))
    } finally q.stop()
  }
}
