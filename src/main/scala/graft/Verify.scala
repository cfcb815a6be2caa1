package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same tail hygiene as Bench (r20): the audited-benign WindowExec
    // single-partition WARN repeats per execution and buries the tail;
    // the per-gate heartbeat below replaces it with progress a killed or
    // stalled run's tail can actually be diagnosed from
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // log config must not kill verify
    new java.io.File(outDir).mkdirs()
    // The d03/t06/d06 oracles mirror FNV-1a64 in DuckDB by folding
    // unicode(c) codepoints, while the Scala side folds UTF-8 bytes, and
    // DuckDB LOWER differs from java toLowerCase outside ASCII — the
    // mirrors are only valid on a pure-ASCII corpus. Enforce that here so
    // a future corpus change fails loudly instead of producing a bogus
    // oracle result.
    locally {
      import org.apache.spark.sql.functions._
      val nonAscii = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("text").isNotNull && col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      require(nonAscii == 0,
        s"documents.text has $nonAscii non-ASCII rows; the DuckDB FNV " +
          "oracle mirrors (d03/t06/d06) assume a pure-ASCII corpus — " +
          "switch their folds to UTF-8 bytes before accepting such data")
    }
    // Local-iteration filter (comma-separated names); the driver never sets
    // it, so per-round runs always dump every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    val t0 = System.nanoTime()
    val gates = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    gates.zipWithIndex.foreach { case ((name, fn), gi) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      System.err.println(f"[verify] ${gi + 1}/${gates.size} $name " +
        f"cum=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // under a local-iteration filter, trim the oracle dump to the gates
    // actually run so check_oracle.py compares exactly those (the driver
    // never sets the filter, so per-round dumps stay complete)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Gate failures must be LOUD, not silent absences: round 10's events
    // fixture drift made 8 broken gates look merely "untested" because
    // their output dirs never appeared. Name every failure in an artifact
    // next to the dumps and on stdout (the driver captures the tail).
    // Exit stays 0 so the surviving gates' comparison still runs.
    val errJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (failed.nonEmpty)
      println(s"[verify] SUMMARY: ${failed.size} gate(s) FAILED: " +
        failed.keys.mkString(", "))
    spark.stop()
  }
}
