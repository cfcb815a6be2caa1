package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
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

  /** One reported near-duplicate: `doc_id` matched the earlier-arrived
    * `dup_of` in some LSH band bucket with estimated Jaccard `est_j`. */
  final case class NearDupHit(doc_id: Long, dup_of: Long, est_j: Double)

  private[streaming] final case class MemberSig(id: Long, sig: Array[Long])
  private[streaming] final case class BucketState(members: Array[MemberSig])

  /** Cross-micro-batch NEAR-duplicate detection: the streaming form of
    * [[graft.operators.Dedup.minhashLshPairs]]. Each document's MinHash
    * signature ([[graft.functions.TextExpressions.minhash]]) fans out to
    * `bands` band buckets; state is keyed by (band, bucketHash) and holds
    * the signatures previously admitted to that bucket, so an incoming
    * document only ever compares against its bucket-mates — the same
    * candidates the batch LSH join would generate, paid incrementally.
    * A hit `(doc_id, dup_of, est_j)` is emitted when the incoming doc's
    * signature agrees with a stored one on ≥ `threshold` of positions
    * (estimated Jaccard, exact integer count / numHashes — engine-portable
    * arithmetic, which is what lets the d16 gate mirror the whole operator
    * in SQL); `dup_of` is the smallest matching bucket-mate. One doc can
    * hit in several buckets — downstream keeps min(dup_of) per doc.
    *
    * Determinism: bucket-mates are "arrived in an earlier batch, or same
    * batch with smaller id" — each batch's bucket rows are sorted by id
    * before processing, so output is partitioning-independent. Feed
    * batches in id order when a global lowest-id-wins contract is wanted.
    *
    * At scale: state is hash-partitioned by bucket key; each doc stores
    * its signature in `bands` buckets (bands·numHashes longs per doc —
    * the memory/recall trade of streaming LSH; shrink `numHashes` or TTL
    * state for long streams). `bucketCap` bounds any one bucket: past the
    * cap a bucket stops ADMITTING new signatures (still compares against
    * the resident ones) — a boilerplate bucket degrades gracefully
    * instead of growing O(corpus). */
  def nearDupHits(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, k: Int = 3,
      threshold: Double = 0.9, bucketCap: Int = Int.MaxValue): Dataset[NearDupHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    implicit val rowTupleEnc = Encoders.product[(Int, Int, Long, Array[Long])]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val hitEnc = Encoders.product[NearDupHit]
    implicit val keyEnc = Encoders.product[(Int, Int)]
    val banded = df
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.TextExpressions.minhash(col(textCol), numHashes, k)
          .as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * r + lit(1), lit(r)), b)))
          .as(Seq("band", "bhash")))
      .select(col("band"), col("bhash"), col("doc_id"), col("sig"))
      .as[(Int, Int, Long, Array[Long])]
    banded
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Int), rows: Iterator[(Int, Int, Long, Array[Long])],
            state: GroupState[BucketState]) =>
          val batch = rows.toArray.sortBy(_._3) // same-batch ties: id order
          var members = state.getOption.map(_.members)
            .getOrElse(Array.empty[MemberSig])
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          batch.foreach { case (_, _, id, sig) =>
            var bestId = Long.MaxValue
            var bestEq = 0
            members.foreach { m =>
              var eq = 0
              var i = 0
              while (i < sig.length) {
                if (m.sig(i) == sig(i)) eq += 1
                i += 1
              }
              if (eq.toDouble / numHashes >= threshold && m.id < bestId) {
                bestId = m.id
                bestEq = eq
              }
            }
            if (bestId != Long.MaxValue)
              out += NearDupHit(id, bestId, bestEq.toDouble / numHashes)
            if (members.length < bucketCap)
              members = members :+ MemberSig(id, sig)
          }
          state.update(BucketState(members))
          out.iterator
      }
  }
}
