package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical event-time access for the `events` fixture.
  *
  * The driver has shipped `events.parquet` with two different physical
  * schemas for `ts`:
  *   - parquet TIMESTAMP(NANOS), which Spark's vectorized reader only
  *     surfaces as a nanos-since-epoch LONG (via
  *     `spark.sql.legacy.parquet.nanosAsLong`), and
  *   - parquet timestamp[us] (isAdjustedToUTC=false), which Spark reads
  *     as TIMESTAMP_NTZ.
  * DuckDB reads both as a naive TIMESTAMP truncated/kept at µs, so the
  * engine-vs-oracle contract is defined at MICROSECOND precision on the
  * naive (UTC-interpreted) wall clock. This loader normalizes either
  * schema to that contract once, so every event-time query is written
  * against two derived columns and never touches raw `ts`:
  *   - `ts_us` — epoch micros as BIGINT (comparisons, gaps, frames);
  *   - `ts_t`  — the same instant as a UTC TIMESTAMP (calendar math:
  *     date_trunc hour/week, sequences). Sessions pin
  *     `spark.sql.session.timeZone=UTC`, so date_trunc on `ts_t`
  *     matches DuckDB's naive date_trunc exactly.
  *
  * Scale note: both derivations are row-local codegen'd projections over
  * the scan — no shuffle, no UDF, and column pruning still reaches the
  * parquet reader for queries that drop `ts`.
  */
object EventTime {

  /** `events` with canonical `ts_us` (BIGINT epoch-µs) and `ts_t`
    * (TIMESTAMP, UTC) columns, whatever schema the fixture has. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    // harmless when ts is already µs; required when it is NANOS
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.withColumn("ts_us", microsCol(df))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }

  /** Epoch-micros expression for whatever type `ts` landed as. */
  def microsCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts div 1000") // nanos → µs (DuckDB truncates identically)
    case TimestampNTZType => expr("unix_micros(cast(ts as timestamp))") // naive-as-UTC under session tz UTC
    case TimestampType    => expr("unix_micros(ts)")
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other; expected LONG (nanos), TIMESTAMP or TIMESTAMP_NTZ")
  }
}
