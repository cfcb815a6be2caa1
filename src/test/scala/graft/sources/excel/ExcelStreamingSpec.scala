package graft.sources.excel

import java.io.{File, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming read: file discovery, incremental batches, and — the part the
  * reference cannot do (SURVEY.md bug B3) — exactly-once restart from a
  * checkpoint. */
class ExcelStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val idName = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  private def writeFile(dir: File, fname: String, rows: Seq[(Int, String)]): Unit = {
    val f = new File(dir, fname)
    val w = new XlsxWriter(new FileOutputStream(f))
    w.writeRow(Seq("id", "name"))
    rows.foreach { case (i, n) => w.writeRow(Seq(i.toLong, n)) }
    w.close()
  }

  test("micro-batch discovery: existing files, then new files, no re-reads") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile
    val out = Files.createTempDirectory("graft-sink").toFile
    writeFile(dir, "a.xlsx", Seq(1 -> "one", 2 -> "two"))

    def startQuery() = spark.readStream.format("excel").schema(idName)
      .load(dir.getAbsolutePath)
      .writeStream.format("parquet")
      .option("path", out.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    def sinkIds(): Seq[Int] =
      spark.read.parquet(out.getAbsolutePath).collect().map(_.getInt(0)).toSeq.sorted

    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(sinkIds() == Seq(1, 2))

      writeFile(dir, "b.xlsx", Seq(3 -> "three"))
      q.processAllAvailable()
      assert(sinkIds() == Seq(1, 2, 3)) // only the new file read
    } finally q.stop()

    // restart from checkpoint with one more file: only the unseen file reads
    // (the reference re-reads everything here — bug B3)
    writeFile(dir, "c.xlsx", Seq(4 -> "four"))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(sinkIds() == Seq(1, 2, 3, 4), s"restart produced: ${sinkIds()}")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger drains a backlog in bounded batches") {
    val dir = Files.createTempDirectory("graft-adm").toFile
    val ckpt = Files.createTempDirectory("graft-adm-ck").toFile
    (1 to 4).foreach(i => writeFile(dir, s"f$i.xlsx", Seq(i -> s"n$i")))

    val q = spark.readStream.format("excel").schema(idName)
      .option("maxFilesPerTrigger", "1")
      .load(dir.getAbsolutePath)
      .writeStream.format("memory").queryName("adm_out")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("adm_out").count() == 4) // all data arrives…
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected ≥4 bounded batches, got $batches") // …in 1-file batches
    } finally q.stop()
  }

  test("offset JSON round-trips") {
    val o = ExcelStreamOffset(Seq("/p/a \"x\".xlsx", "/p/b\\c.xlsx"))
    assert(ExcelStreamOffset.fromJson(o.json()) == o)
    assert(ExcelStreamOffset.fromJson(ExcelStreamOffset(Nil).json()) ==
      ExcelStreamOffset(Nil))
  }
}
