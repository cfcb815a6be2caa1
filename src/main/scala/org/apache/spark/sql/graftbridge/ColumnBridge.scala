package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]` in Spark
  * 4, so this one-file subpackage of `org.apache.spark.sql` re-exports the
  * two conversions our custom Catalyst expressions need — the same pattern
  * other OSS Spark extensions use to expose typed Columns. No Spark
  * internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst's own pushed-filter machinery (what CSV/JSON sources use):
    * exact Spark comparison semantics — UTF8 binary string order, integral
    * long compares, IEEE ±0.0 — instead of hand-rolled re-implementations. */
  def supportedFilters(
      filters: Array[org.apache.spark.sql.sources.Filter],
      schema: org.apache.spark.sql.types.StructType): Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.catalyst.StructFilters.pushedFilters(filters, schema)

  def orderedFilters(
      filters: Seq[org.apache.spark.sql.sources.Filter],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.catalyst.OrderedFilters =
    new org.apache.spark.sql.catalyst.OrderedFilters(filters, schema)

  /** Spark's own per-type ordering over INTERNAL values (UTF8String binary
    * order, integral/IEEE numerics, date/timestamp longs) — what the
    * MIN/MAX aggregate pushdown accumulates with, so in-scan extremes agree
    * exactly with the engine's. */
  def interpretedOrdering(
      dt: org.apache.spark.sql.types.DataType): Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
      .asInstanceOf[Ordering[Any]]
}
