package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.QuantileSketch

/** STREAMING quantile sketch — the incremental twin of the q53 batch
  * sketch, and the reason its compaction was derandomized in the first
  * place: because an item's survival level is a pure function of its key
  * ([[QuantileSketch.levelOf]]), the sketch state after ANY prefix of
  * micro-batches equals the batch sketch over the union of those batches
  * — bit-for-bit, not approximately. Streaming-vs-batch equality is
  * therefore an EXACT oracle property (the gate's DuckDB mirror replays
  * the batch sketch over the same rows), something no coin-flipping KLL
  * can offer.
  *
  * State per slice is bounded: a (maxLevel+2)-entry level histogram plus
  * the ≤ capacity kept rows above the current threshold. Each batch
  * merges levels into the histogram, re-derives the threshold (monotone
  * non-decreasing in data, so previously evicted rows can never re-enter
  * — eviction is safe), filters the carried + new rows, and emits a
  * snapshot with the current p50 estimate. */
object StreamingSketch {

  case class SkRow(slice: String, key: Long, value: Long, lvl: Int)
  case class SkState(counts: Array[Long], keptKeys: Array[Long],
    keptVals: Array[Long], keptLvls: Array[Int], nTotal: Long)
  case class SkSnapshot(slice: String, n_total: Long, t_slice: Int,
    n_kept: Long, est_p50: Long)

  /** Per-slice streaming sketch snapshots (one per slice per micro-batch
    * that delivers rows for it; `n_total` is monotone, so the final
    * snapshot per slice is the max-`n_total` row). `keyCol` must be
    * unique per row. */
  def quantileSketch(df: DataFrame, sliceCol: String, keyCol: String,
      valCol: String, capacity: Int = 512,
      maxLevel: Int = QuantileSketch.DefaultMaxLevel): Dataset[SkSnapshot] = {
    implicit val rowEnc = Encoders.product[SkRow]
    implicit val stateEnc = Encoders.product[SkState]
    implicit val snapEnc = Encoders.product[SkSnapshot]
    implicit val keyEnc = Encoders.STRING
    val rows = df.select(col(sliceCol).cast("string").as("slice"),
      col(keyCol).cast("long").as("key"),
      col(valCol).cast("long").as("value"))
      .withColumn("lvl", QuantileSketch.levelOf(col("key"), maxLevel))
      .as[SkRow]
    rows.groupByKey(_.slice)
      .flatMapGroupsWithState[SkState, SkSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (slice: String, it: Iterator[SkRow], state: GroupState[SkState]) =>
          val st = state.getOption.getOrElse(
            SkState(new Array[Long](maxLevel + 2), Array.empty, Array.empty,
              Array.empty, 0L))
          val counts = st.counts.clone()
          var nTotal = st.nTotal
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          var i = 0
          while (i < st.keptKeys.length) {
            buf += ((st.keptKeys(i), st.keptVals(i), st.keptLvls(i)))
            i += 1
          }
          it.foreach { r =>
            counts(r.lvl) += 1
            nTotal += 1
            buf += ((r.key, r.value, r.lvl))
          }
          def tail(t: Int): Long = {
            var s = 0L; var l = t
            while (l <= maxLevel) { s += counts(l); l += 1 }
            s
          }
          var t = 0
          while (tail(t) > capacity) t += 1
          val kept = buf.filter(_._3 >= t).sortBy(x => (x._2, x._1)).toArray
          val w = 1L << t
          val target = (nTotal * 500 + 999) / 1000
          var estIdx = -1
          var j = 0
          while (estIdx < 0 && j < kept.length) {
            if ((j + 1).toLong * w >= target) estIdx = j
            j += 1
          }
          val est =
            if (estIdx >= 0) kept(estIdx)._2
            else if (kept.nonEmpty) kept.last._2
            else 0L
          state.update(SkState(counts, kept.map(_._1), kept.map(_._2),
            kept.map(_._3), nTotal))
          Iterator.single(SkSnapshot(slice, nTotal, t, kept.length, est))
      }
  }
}
