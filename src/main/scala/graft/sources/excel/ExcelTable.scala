package graft.sources.excel

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

class ExcelTable(tableSchema: StructType, opts: ExcelOptions)
    extends Table with SupportsRead with SupportsWrite {

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
