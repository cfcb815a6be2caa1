package graft.sources.excel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset,
  ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch file-discovery stream over a directory of xlsx files.
  *
  * The reference's stream reader (`/root/reference/src/pyspark_datasource/
  * excel/connector.py:206-277`) keeps its seen-set in driver memory and
  * ignores the `start`/`end` offsets it is handed (bugs B2/B3: restart
  * re-reads everything; double `latestOffset()` skips files). Here the
  * offset IS the state: a sorted list of every file visible at that point,
  * so `planInputPartitions(start, end)` = `end.files − start.files` is a
  * pure function of offsets — replayable from any checkpoint, no driver
  * state, exactly-once per file. Offset size grows with the file count;
  * a production deployment would compact (e.g. retention window on
  * mtime), which is noted rather than implemented here.
  */
class ExcelMicroBatchStream(fullSchema: StructType, schema: StructType,
    opts: ExcelOptions, checkpointLocation: String,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    limit: Int = -1)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def conf = SparkSession.active.sessionState.newHadoopConf()

  /** Under Trigger.AvailableNow, the listing captured at query start: the
    * stream must drain exactly this set (in maxFilesPerTrigger-bounded
    * batches) and then stop. Implementing [[SupportsTriggerAvailableNow]]
    * keeps Spark from wrapping us in AvailableNowDataStreamWrapper, which
    * would silently discard the ReadMaxFiles limit. */
  @volatile private var availableNowFiles: Option[Seq[String]] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowFiles = Some(ExcelFiles.list(opts.path, conf, opts.recursiveFileLookup).sorted)
  }

  private def currentListing(): Seq[String] =
    availableNowFiles.getOrElse(ExcelFiles.list(opts.path, conf, opts.recursiveFileLookup).sorted)

  override def initialOffset(): Offset = ExcelStreamOffset(Nil)

  override def latestOffset(): Offset = ExcelStreamOffset(currentListing())

  /** Admission control: `maxFilesPerTrigger` bounds each micro-batch so a
    * backlogged directory (or a 100 TB bootstrap) drains in bounded-size
    * batches instead of one giant first batch. */
  override def getDefaultReadLimit: ReadLimit =
    opts.maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[ExcelStreamOffset].files
    val seenSet = seen.toSet
    val fresh = currentListing().filterNot(seenSet)
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    ExcelStreamOffset((seen ++ admitted).sorted)
  }

  override def deserializeOffset(json: String): Offset =
    ExcelStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[ExcelStreamOffset].files.toSet
    val fresh = end.asInstanceOf[ExcelStreamOffset].files.filterNot(seen)
    // maxRowsPerPartition applies per admitted file: a large workbook
    // landing in a micro-batch fans out across executors like in batch
    ExcelSplitPlanner.plan(fresh, opts, conf, filters)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ExcelPartitionReaderFactory(fullSchema, schema, opts, limit,
      new SerializableConfiguration(conf), filters)

  override def commit(end: Offset): Unit = () // offsets are self-contained

  override def stop(): Unit = ()
}

/** JSON-serializable offset: the sorted set of files visible at this point. */
case class ExcelStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("{\"files\":[", ",", "]}")
}

object ExcelStreamOffset {
  /** Minimal parser for the exact shape `{"files":["a","b"]}` we emit. */
  def fromJson(json: String): ExcelStreamOffset = {
    val body = json.trim
      .stripPrefix("{\"files\":[").stripSuffix("]}")
    if (body.isEmpty) ExcelStreamOffset(Nil)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inStr = false
      var esc = false
      body.foreach { c =>
        if (esc) { sb.append(c); esc = false }
        else if (c == '\\') esc = true
        else if (c == '"') {
          if (inStr) { out += sb.toString; sb.clear() }
          inStr = !inStr
        } else if (inStr) sb.append(c)
      }
      ExcelStreamOffset(out.toSeq)
    }
  }
}
