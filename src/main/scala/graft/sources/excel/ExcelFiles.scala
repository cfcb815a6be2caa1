package graft.sources.excel

import java.io.File

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.AnalysisException

/** File listing + local-access helpers on the Hadoop FileSystem API.
  *
  * The reference lists with `os.listdir` (local FS only, non-recursive,
  * case-insensitive `.xlsx` suffix — `/root/reference/src/pyspark_datasource/
  * excel/connector.py:148-156`, bug B6 in SURVEY.md). Going through Hadoop
  * FS keeps those listing semantics but gains HDFS/S3/abfs support, which a
  * 1000-executor deployment needs.
  */
object ExcelFiles {

  /** Listing admits `.xlsx` (the reference's surface) plus `.xlsm` —
    * macro-enabled workbooks are the same OOXML zip (identical
    * worksheet parts under `xl/worksheets`, plus a vbaProject part the
    * reader never opens), so the StAX codec reads them unchanged. Legacy
    * binary `.xls` (BIFF, not a zip) stays excluded, matching the
    * reference's B6 listing. */
  private def hasExcelSuffix(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".xlsx") || n.endsWith(".xlsm")
  }

  /** path → sorted list of xlsx file URIs (dir: one level by default,
    * `.xlsx`/`.xlsm` only; file: itself; glob pattern:
    * every match, dirs expanded). `recursive=true` (the
    * `recursiveFileLookup` option) descends into subdirectories — the
    * date-partitioned `dt=.../part.xlsx` layout object stores use.
    * Missing path → AnalysisException like the reference's error
    * normalization. */
  def list(pathStr: String, conf: Configuration,
      recursive: Boolean = false): Seq[String] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    if (hasGlob(pathStr)) {
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      if (matches.isEmpty) {
        throw new AnalysisException(
          errorClass = "PATH_NOT_FOUND",
          messageParameters = Map("path" -> pathStr))
      }
      return matches.flatMap { s =>
        if (s.isDirectory) listDir(fs, s.getPath, recursive)
        else Seq(s.getPath.toString)
      }.distinct.sorted
    }
    if (!fs.exists(path)) {
      throw new AnalysisException(
        errorClass = "PATH_NOT_FOUND",
        messageParameters = Map("path" -> pathStr))
    }
    val status = fs.getFileStatus(path)
    if (status.isDirectory) listDir(fs, path, recursive)
    else Seq(path.toString)
  }

  /** Total on-disk bytes of the files [[list]] would plan, from the same
    * listing (the sizes are already in the `FileStatus`es the listing
    * fetches — no extra RPCs). Feeds the scan's
    * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
    * estimate so Catalyst can size excel relations for join planning.
    * Swallows nothing: a missing path throws exactly like [[list]]. */
  def totalBytes(pathStr: String, conf: Configuration,
      recursive: Boolean = false): Long = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    if (hasGlob(pathStr)) {
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      if (matches.isEmpty) {
        throw new AnalysisException(
          errorClass = "PATH_NOT_FOUND",
          messageParameters = Map("path" -> pathStr))
      }
      return matches.flatMap { s =>
        if (s.isDirectory) listDirWithSizes(fs, s.getPath, recursive)
        else Seq(s.getPath.toString -> s.getLen)
      }.distinctBy(_._1).map(_._2).sum
    }
    if (!fs.exists(path)) {
      throw new AnalysisException(
        errorClass = "PATH_NOT_FOUND",
        messageParameters = Map("path" -> pathStr))
    }
    val status = fs.getFileStatus(path)
    if (status.isDirectory) listDirWithSizes(fs, path, recursive).map(_._2).sum
    else status.getLen
  }

  private def listDirWithSizes(fs: FileSystem, dir: Path,
      recursive: Boolean): Seq[(String, Long)] = {
    val (dirs, files) = fs.listStatus(dir).toSeq.partition(_.isDirectory)
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    val here = files
      .filter { s =>
        val n = s.getPath.getName
        hasExcelSuffix(n) && visible(n)
      }
      .map(s => s.getPath.toString -> s.getLen)
    val below =
      if (!recursive) Seq.empty
      else dirs.filter(d => visible(d.getPath.getName))
        .flatMap(d => listDirWithSizes(fs, d.getPath, recursive = true))
    here ++ below
  }

  /** Like [[list]] but returning (uri, modificationTimeMs) pairs — the
    * streaming source's retention compaction needs mtimes to expire old
    * entries from its offset. Same visibility/suffix/recursion semantics. */
  def listWithTimes(pathStr: String, conf: Configuration,
      recursive: Boolean = false): Seq[(String, Long)] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    if (hasGlob(pathStr)) {
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      if (matches.isEmpty) {
        throw new AnalysisException(
          errorClass = "PATH_NOT_FOUND",
          messageParameters = Map("path" -> pathStr))
      }
      return matches.flatMap { s =>
        if (s.isDirectory) listDirWithTimes(fs, s.getPath, recursive)
        else Seq(s.getPath.toString -> s.getModificationTime)
      }.distinctBy(_._1).sortBy(_._1)
    }
    if (!fs.exists(path)) {
      throw new AnalysisException(
        errorClass = "PATH_NOT_FOUND",
        messageParameters = Map("path" -> pathStr))
    }
    val status = fs.getFileStatus(path)
    if (status.isDirectory) listDirWithTimes(fs, path, recursive)
    else Seq(path.toString -> status.getModificationTime)
  }

  private def listDirWithTimes(fs: FileSystem, dir: Path,
      recursive: Boolean): Seq[(String, Long)] = {
    val (dirs, files) = fs.listStatus(dir).toSeq.partition(_.isDirectory)
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    val here = files
      .filter { s =>
        val n = s.getPath.getName
        hasExcelSuffix(n) && visible(n)
      }
      .map(s => s.getPath.toString -> s.getModificationTime)
    val below =
      if (!recursive) Seq.empty
      else dirs.filter(d => visible(d.getPath.getName))
        .flatMap(d => listDirWithTimes(fs, d.getPath, recursive = true))
    (here ++ below).sortBy(_._1)
  }

  private def hasGlob(p: String): Boolean =
    p.exists(c => c == '*' || c == '?' || c == '[' || c == '{')

  private def listDir(fs: FileSystem, dir: Path, recursive: Boolean): Seq[String] = {
    val (dirs, files) = fs.listStatus(dir).toSeq.partition(_.isDirectory)
    // skip hidden/temp files AND directories (Spark file-source convention)
    // so readers never admit a half-written sink temp into an offset
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    val here = files
      .filter { s =>
        val n = s.getPath.getName
        hasExcelSuffix(n) && visible(n)
      }
      .map(_.getPath.toString)
    val below =
      if (!recursive) Seq.empty
      else dirs.filter(d => visible(d.getPath.getName))
        .flatMap(d => listDir(fs, d.getPath, recursive = true))
    (here ++ below).sorted
  }

  /** Open an xlsx for random access. ZIP needs a seekable local file, so a
    * remote (hdfs/s3) object is staged to a local temp file first — bounded
    * by the format's own ~1M-row ceiling, and per-task, so it scales with
    * the cluster. Returns (file, deleteAfter). */
  def toLocal(pathStr: String, conf: Configuration): (File, Boolean) = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    fs.getScheme match {
      case "file" =>
        (new File(path.toUri.getPath), false)
      case _ =>
        val tmp = File.createTempFile("graft-excel-stage", ".xlsx")
        fs.copyToLocalFile(false, path, new Path(tmp.getAbsolutePath), true)
        (tmp, true)
    }
  }
}
