package graft.streaming

import java.io.{File, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.excel.{XlsxReader, XlsxWriter}

/** End-to-end streaming composition: excel directory stream → stateful
  * dedup ([[StreamingDedup]]) → excel streaming sink. The full
  * ingest-clean-publish loop a pipeline runs, across micro-batches and
  * with duplicates arriving both within and across files. */
class StreamingComposeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", StringType)))

  private def writeFile(dir: File, fname: String, rows: Seq[(Long, String)]): Unit = {
    val f = new File(dir, fname)
    val w = new XlsxWriter(new FileOutputStream(f))
    w.writeRow(Seq("doc_id", "fp"))
    rows.foreach { case (i, s) => w.writeRow(Seq(i, s)) }
    w.close()
  }

  private def sinkRows(out: File): Set[(Long, String)] =
    out.listFiles().filter(_.getName.endsWith(".xlsx")).flatMap { f =>
      val r = new XlsxReader(f)
      try {
        val it = r.rowIterator(r.sheets.head)
        it.next() // header
        it.map(row => (row(0).asInstanceOf[java.lang.Double].longValue(),
          row(1).asInstanceOf[String])).toList
      } finally r.close()
    }.toSet

  test("excel stream -> stateful dedup -> excel streaming sink") {
    val in = Files.createTempDirectory("graft-compose-in").toFile
    val out = Files.createTempDirectory("graft-compose-out").toFile
    val ckpt = Files.createTempDirectory("graft-compose-ckpt").toFile

    // batch 1: duplicate fp=x within one file (lowest doc_id wins)
    writeFile(in, "a.xlsx", Seq(7L -> "x", 3L -> "x", 5L -> "y"))

    val deduped = StreamingDedup.firstOccurrence(
      spark.readStream.format("excel").schema(schema)
        .load(in.getAbsolutePath),
      "fp", "doc_id")

    val q = deduped.writeStream.format("excel")
      .outputMode("append")
      .option("path", out.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(sinkRows(out) == Set(3L -> "x", 5L -> "y"))

      // batch 2: new file re-sends fp=x (dropped by state), adds fp=z
      writeFile(in, "b.xlsx", Seq(9L -> "x", 8L -> "z"))
      q.processAllAvailable()
      assert(sinkRows(out) == Set(3L -> "x", 5L -> "y", 8L -> "z"))

      // no staging remnants; every VISIBLE (non-dot) file is a final
      // workbook (dot-prefixed Hadoop .crc artifacts are fine — readers
      // never list them)
      assert(out.listFiles().forall(f => !f.getName.contains(".inprogress")))
      assert(out.listFiles().filterNot(_.getName.startsWith("."))
        .forall(_.getName.endsWith(".xlsx")))
    } finally q.stop()
  }
}
