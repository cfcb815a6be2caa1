package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LATE-DATA metering — the streaming twin of the batch
  * late-data audit (p23): per user, an event's lateness is how far the
  * user's event-time high-water mark (running MAX over arrival order)
  * had already passed the event's own timestamp when it arrived. This is
  * the live signal a pipeline reads to SIZE `withWatermark` bounds —
  * computed incrementally with 8 bytes of state per user.
  *
  * Determinism contract (the d08/d16 batch-replay discipline): within a
  * micro-batch each user's rows process in ascending `seqCol` order (the
  * explicit sort below — so shard/file order WITHIN a micro-batch is
  * immaterial), and the MICRO-BATCHES must partition the sequence range
  * monotonically (a later micro-batch carries only later sequence
  * numbers per user) — then the streaming output is row-identical to
  * the batch running-max window over (user, seq), which is what the
  * oracle replays.
  *
  * State: one Long (max event-time so far) per user, hash-partitioned —
  * the minimum possible footprint; idle users can be TTL'd exactly like
  * [[StreamingDedup]] if the key space is unbounded. */
object StreamingLateness {

  case class Ev(user_id: Long, event_id: Long, event_type: String,
      ts_eff: Long)
  case class Late(event_id: Long, event_type: String, late_us: Long)

  /** @param df streaming frame with LongType `user_id`/`event_id`/`ts_eff`
    *           and StringType `event_type`
    * @return append-mode stream of (event_id, event_type, late_us) */
  def lateness(df: DataFrame): DataFrame = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Late]
    implicit val longEnc = Encoders.scalaLong
    df.selectExpr("user_id", "event_id", "event_type", "ts_eff").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(_.event_id)
          var mx = state.getOption.getOrElse(Long.MinValue)
          val out = sorted.map { e =>
            mx = math.max(mx, e.ts_eff)
            Late(e.event_id, e.event_type, mx - e.ts_eff)
          }
          state.update(mx)
          out.iterator
      }.toDF()
  }
}
