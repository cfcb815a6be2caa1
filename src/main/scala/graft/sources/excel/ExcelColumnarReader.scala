package graft.sources.excel

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar fast path (`enableArrow=true`): the JVM re-expression of the
  * reference's pyarrow RecordBatch branch (`/root/reference/src/
  * pyspark_datasource/excel/connector.py:192-197`). Cells are decoded
  * straight into OnHeapColumnVectors and handed to Spark as
  * [[ColumnarBatch]]es, skipping per-row InternalRow materialization; the
  * reference's motivation (avoid per-row pickling) maps here to avoiding
  * per-row object churn before the first whole-stage-codegen boundary. */
class ExcelColumnarPartitionReader(filePath: String, fullSchema: StructType,
    requiredSchema: StructType,
    opts: ExcelOptions, limit: Int,
    conf: org.apache.hadoop.conf.Configuration,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    batchSize: Int = 4096,
    startRow: Int = -1, endRowExcl: Int = -1, sheetOverride: String = null)
    extends PartitionReader[ColumnarBatch] {

  // reuse the row reader's file/sheet/column-resolution/filter logic
  private val rowReader = new ExcelPartitionReader(
    filePath, fullSchema, requiredSchema, opts, limit, conf, filters,
    startRow, endRowExcl, sheetOverride)

  private var vectors: Array[OnHeapColumnVector] = _
  private var batch: ColumnarBatch = _

  private def allocate(): Unit = {
    vectors = requiredSchema.fields.map(f =>
      new OnHeapColumnVector(batchSize, f.dataType))
    batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
  }

  override def next(): Boolean = {
    if (batch == null) allocate() else vectors.foreach(_.reset())
    var n = 0
    while (n < batchSize && rowReader.next()) {
      val row = rowReader.get()
      var i = 0
      while (i < requiredSchema.length) {
        writeValue(vectors(i), requiredSchema.fields(i).dataType, n, row, i)
        i += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  private def writeValue(v: OnHeapColumnVector, dt: DataType, rowId: Int,
      row: InternalRow, ordinal: Int): Unit = {
    if (row.isNullAt(ordinal)) { v.putNull(rowId); return }
    dt match {
      case StringType =>
        val bytes = row.getUTF8String(ordinal).getBytes
        v.putByteArray(rowId, bytes, 0, bytes.length)
      case IntegerType | DateType => v.putInt(rowId, row.getInt(ordinal))
      case LongType | TimestampType => v.putLong(rowId, row.getLong(ordinal))
      case DoubleType => v.putDouble(rowId, row.getDouble(ordinal))
      case FloatType => v.putFloat(rowId, row.getFloat(ordinal))
      case BooleanType => v.putBoolean(rowId, row.getBoolean(ordinal))
      case other => throw new UnsupportedOperationException(other.toString)
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    rowReader.close()
    if (batch != null) batch.close()
  }
}
