package graft.sources.excel

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

class ExcelTable(tableSchema: StructType, opts: ExcelOptions)
    extends Table with SupportsRead with SupportsWrite
    with SupportsMetadataColumns {

  /** `_file_path`: the listed URI of the row's source workbook — the
    * hook for manifest joins and file-level pruning (static pushed
    * filters AND [[ExcelScan]]'s runtime filtering both prune the file
    * list on it). Spark's metadata-column machinery shadows it
    * automatically if a data column uses the name. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = ExcelSchema.FilePathColumn
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "URI of the xlsx file this row was read from"
    })

  override def name(): String = s"excel:${opts.pathOpt.getOrElse("?")}"

  override def schema(): StructType = tableSchema

  override def capabilities(): JSet[TableCapability] = Set(
    TableCapability.BATCH_READ,
    TableCapability.BATCH_WRITE,
    TableCapability.MICRO_BATCH_READ,
    TableCapability.STREAMING_WRITE,
    TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table-creation options with per-read options (read side wins)
    val merged = ExcelOptions.fromMap(
      opts.options ++ ExcelOptions(options).options)
    new ExcelScanBuilder(tableSchema, merged)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = ExcelOptions.fromMap(
      opts.options ++ ExcelOptions(info.options()).options)
    new ExcelWriteBuilder(info.schema(), merged)
  }
}
