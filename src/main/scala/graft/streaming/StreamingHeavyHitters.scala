package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters

/** STREAMING count–min heavy hitters — the incremental twin of q30's
  * batch [[HeavyHitters.CountMinAggregator]]. The whole point of
  * count–min as STREAM state is that its registers are sums: element-wise
  * addition commutes and associates, so the keyed state after any prefix
  * of micro-batches is bit-identical to the batch sketch over the union
  * of those batches, regardless of arrival order or batching. (Contrast
  * Misra–Gries/space-saving, whose kept set depends on arrival order —
  * that family can never carry a batch-replay oracle.)
  *
  * State per slice: the depth×width register array, the bounded set of
  * distinct keys seen (heavy-hitter reports are over few keys by
  * definition — `maxKeys` guards state growth), and the running row
  * count. Each micro-batch folds its rows into the registers and emits
  * one snapshot row per tracked key with the key's current CM estimate;
  * `n_total` is monotone per slice, so the final report per (slice, key)
  * is the max-`n_total` row.
  *
  * At 100 TB the stream-side cost per row is depth register increments;
  * nothing per-key ever shuffles except the fixed-size state itself. */
object StreamingHeavyHitters {

  case class HhRow(slice: String, key: String)
  case class HhState(registers: Array[Long], keys: Array[String],
    nTotal: Long)
  case class HhSnapshot(slice: String, key: String, n_total: Long,
    est_count: Long)

  /** Per-slice streaming count–min snapshots (one row per tracked key
    * per micro-batch that delivers rows for the slice). */
  def countMin(df: DataFrame, sliceCol: String, keyCol: String,
      depth: Int = 4, width: Int = 1024, seed: Long = 42L,
      maxKeys: Int = 1000): Dataset[HhSnapshot] = {
    implicit val rowEnc = Encoders.product[HhRow]
    implicit val stateEnc = Encoders.product[HhState]
    implicit val snapEnc = Encoders.product[HhSnapshot]
    implicit val keyEnc = Encoders.STRING
    val rows = df.select(col(sliceCol).cast("string").as("slice"),
      col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .as[HhRow]
    rows.groupByKey(_.slice)
      .flatMapGroupsWithState[HhState, HhSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (slice: String, it: Iterator[HhRow], state: GroupState[HhState]) =>
          val st = state.getOption.getOrElse(
            HhState(new Array[Long](depth * width), Array.empty, 0L))
          val regs = st.registers.clone()
          var n = st.nTotal
          val keys = scala.collection.mutable.SortedSet(st.keys.toSeq: _*)
          it.foreach { r =>
            var d = 0
            while (d < depth) {
              regs(d * width +
                HeavyHitters.rowIndex(r.key, d, width, seed)) += 1L
              d += 1
            }
            n += 1
            keys += r.key
          }
          require(keys.size <= maxKeys,
            s"more than $maxKeys tracked keys in slice '$slice'")
          state.update(HhState(regs, keys.toArray, n))
          keys.iterator.map { k =>
            HhSnapshot(slice, k, n,
              HeavyHitters.estimate(regs, k, depth, width, seed))
          }
      }
  }
}
