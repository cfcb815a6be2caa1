package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-micro-batch exact deduplication for streaming ingestion:
  * `flatMapGroupsWithState` keyed by a fingerprint column, with one boolean
  * of state per distinct key — "have I ever emitted this fingerprint".
  *
  * Semantics: the first-ever occurrence of each key is emitted; everything
  * later (same batch or any later batch) is dropped. Within a batch,
  * duplicates resolve to the row with the MINIMUM tiebreak value, so output
  * is deterministic regardless of partitioning — same canonical-row rule as
  * the batch operator ([[graft.operators.Dedup.exactCanonical]]).
  *
  * At scale: state is hash-partitioned by key across executors (the same
  * shuffle a batch dedup pays, but incremental), sized at O(distinct keys)
  * booleans, and bounded further by `stateTtlMs` — an idle fingerprint is
  * forgotten after the TTL, trading unbounded state for the possibility of
  * re-admitting a duplicate older than the TTL (the standard windowed-dedup
  * trade; Spark's own dropDuplicates-with-watermark makes the same one).
  * Pass the raw text through a fingerprint (md5/fnv1a64) BEFORE this
  * operator so state and shuffle stay fixed-width.
  */
object StreamingDedup {

  /** @param keyCol      fingerprint column (any type; compared as string)
    * @param tiebreakCol LongType column; lowest value wins within a batch
    * @param stateTtlMs  processing-time TTL for idle keys; <= 0 = keep
    *                    state forever
    *
    * @note CHECKPOINT COMPATIBILITY: the state schema (one Boolean per
    *       key) and the key encoding ("k"-prefixed strings, the NUL sentinel for
    *       null) are part of a running query's checkpoint contract.
    *       Changing either — or toggling `stateTtlMs` across the
    *       zero/positive boundary, which switches the
    *       `GroupStateTimeout` mode — is NOT compatible with restarting
    *       from an existing checkpoint; Spark will fail the restart (or,
    *       for the key encoding, silently treat old keys as unseen).
    *       Start a new checkpoint when changing any of them. */
  def firstOccurrence(df: DataFrame, keyCol: String, tiebreakCol: String,
      stateTtlMs: Long = -1L): DataFrame = {
    val schema = df.schema
    val kIdx = schema.fieldIndex(keyCol)
    val tIdx = schema.fieldIndex(tiebreakCol)
    require(schema(tIdx).dataType == org.apache.spark.sql.types.LongType,
      s"tiebreak column '$tiebreakCol' must be LongType, got ${schema(tIdx).dataType}")
    implicit val rowEnc = Encoders.row(schema)
    implicit val boolEnc = Encoders.scalaBoolean
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    // Key encoding must not collide: String.valueOf(null) == "null" would
    // merge a null-fingerprint row with a row whose key is the literal
    // string "null", letting one suppress the other. Real keys get a "k"
    // prefix; null maps to a sentinel no prefixed key can equal (so null
    // fingerprints form their own dedup group, emitted once like any key).
    df.groupByKey { r =>
      val k = r.get(kIdx)
      if (k == null) "\u0000" else "k" + k
    }(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Row](OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key forgotten; rows is empty on timeout
            Iterator.empty
          } else if (state.exists) {
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator.empty
          } else {
            state.update(true)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            var best: Row = null
            var bestT = Long.MaxValue
            rows.foreach { r =>
              val t = r.getLong(tIdx)
              if (best == null || t < bestT) { best = r; bestT = t }
            }
            Iterator.single(best)
          }
      }
  }
}
