package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC upsert view: `mapGroupsWithState` keyed by the record
  * key, holding each key's WINNING event — highest `seq` so far — and
  * emitting the key's current state every micro-batch that touches it.
  * The streaming twin of [[graft.operators.Cdc.latestSnapshot]]: the
  * batch operator compacts a complete changelog; this one maintains the
  * same answer incrementally as the changelog arrives, state merging
  * across micro-batches (a batch-2 update lands on a batch-1 insert's
  * state, never on a rescan of batch 1).
  *
  * Output (Update mode) is itself a state-change log — one row per
  * (key, touching batch) with that key's then-current (op, last_seq,
  * value). A sink that wants the final table compacts it with
  * [[graft.operators.Cdc.latestSnapshot]] keyed on `last_seq` — which is
  * exactly what the excel_stream_cdc gate does, and what an upsert-capable
  * sink (or update-mode materialization) does natively.
  *
  * At scale: state is one fixed-width (op, seq, value) triple per LIVE
  * key, hash-partitioned across executors — the same O(keys) bill the
  * batch compaction's shuffle pays, amortized over batches. Tombstones
  * stay in state so a late out-of-order upsert (seq below the tombstone's)
  * cannot resurrect a deleted key; `seq` must be unique per key
  * (changelog LSN), as in the batch operator.
  */
object StreamingCdc {

  /** @param keyCol long record key; `opCol` string 'I'/'U'/'D';
    *               `seqCol`/`valCol` long. Emits
    *               (keyCol, opCol, last_seq, valCol) per touched key per
    *               batch. */
  def latestState(df: DataFrame, keyCol: String, seqCol: String,
      opCol: String, valCol: String): DataFrame = {
    val schema = df.schema
    val kIdx = schema.fieldIndex(keyCol)
    val oIdx = schema.fieldIndex(opCol)
    val sIdx = schema.fieldIndex(seqCol)
    val vIdx = schema.fieldIndex(valCol)
    implicit val stateEnc = Encoders.tuple(
      Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    val updated = df.groupByKey(_.getLong(kIdx))(Encoders.scalaLong)
      .mapGroupsWithState[(String, Long, Long), (Long, String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Row], state: GroupState[(String, Long, Long)]) =>
          var best = state.getOption.orNull
          rows.foreach { r =>
            val seq = r.getLong(sIdx)
            if (best == null || seq > best._2)
              best = (r.getString(oIdx), seq, r.getLong(vIdx))
          }
          state.update(best)
          (key, best._1, best._2, best._3)
      }
    updated.toDF(keyCol, opCol, "last_seq", valCol)
  }
}
