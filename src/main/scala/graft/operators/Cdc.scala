package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog (CDC) compaction: collapse an insert/update/delete event log
  * into the latest snapshot — the read side of every lakehouse upsert
  * table and the batch twin of a streaming state store. [[Scd2]]-style
  * history (p07) keeps every version; this keeps only the current one.
  *
  * Scale shape: ONE aggregation shuffle on the key, no window and no
  * sort — each key's winner is picked with `max_by(payload, seq)`, a
  * declarative min/max-style aggregate that partial-aggregates map-side,
  * so a 100 TB changelog with a hot key still combines before the
  * exchange and nothing ever materializes a per-key ordered run. Deletes
  * survive the aggregation as the winning op and are dropped in a final
  * row-local filter (a tombstone newer than every upsert removes the
  * key).
  *
  * Contract: `seqCol` is unique per key (a changelog LSN / commit
  * version); ties would make the winner engine-dependent, so require
  * uniqueness upstream.
  */
object Cdc {

  /** Latest state per key from a changelog of (key, op, seq, payload...).
    *
    * @param opCol  column holding 'I'/'U'/'D' (only 'D' is special)
    * @param valCols payload columns to carry into the snapshot
    * @return (keyCol, valCols..., last_seq) — one row per live key */
  def latestSnapshot(changelog: DataFrame, keyCol: String, seqCol: String,
      opCol: String, valCols: Seq[String]): DataFrame = {
    val payload = struct((opCol +: valCols).map(col): _*)
    val winners = changelog
      .groupBy(col(keyCol))
      .agg(max_by(payload, col(seqCol)).as("__last"),
        max(col(seqCol)).as("last_seq"))
    winners
      .filter(col(s"__last.$opCol") =!= "D")
      .select(col(keyCol) +:
        valCols.map(v => col(s"__last.$v").as(v)) :+
        col("last_seq"): _*)
  }

  /** Convenience overload for a single payload column. */
  def latestSnapshot(changelog: DataFrame, keyCol: String, seqCol: String,
      opCol: String, valCol: String): DataFrame =
    latestSnapshot(changelog, keyCol, seqCol, opCol, Seq(valCol))

  /** Row-level diff between two table snapshots — the restatement /
    * reconciliation primitive: which keys were added, removed, or changed
    * between version A and version B, without any changelog (the inverse
    * of [[latestSnapshot]]: derive the changes FROM the states).
    *
    * Scale shape: ONE co-partitioned full outer join on the key. Value
    * comparison happens through [[Checksum.canonicalRow]]'s FNV-1a64 row
    * digest computed BEFORE the join, so the exchange carries
    * (key, 8-byte digest) per side instead of full payloads — at 100 TB
    * the shuffle width is fixed regardless of row width, and the join
    * output is filtered row-locally. No window, no sort, no skew hazard
    * beyond the key distribution itself (a hot key is a data-model bug in
    * a keyed snapshot).
    *
    * @return (keyCols..., change_type) with change_type ∈
    *         'added' | 'removed' | 'changed' — unchanged keys are dropped
    *         (at scale they are the overwhelming majority; emitting them
    *         would make the diff as large as the table) */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    def digested(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) :+
        graft.functions.TextExpressions.fnv1a64(
          Checksum.canonicalRow(valCols.map(col))).as(s"__h_$tag"): _*)
    digested(a, "a").join(digested(b, "b"), keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__h_a").isNull, lit("added"))
          .when(col("__h_b").isNull, lit("removed"))
          .when(col("__h_a") =!= col("__h_b"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }
}
