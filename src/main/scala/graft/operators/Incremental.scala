package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key aggregate table
  * current by merging a new batch's aggregate into it — never rescanning
  * history. The decomposability contract every warehouse rollup relies
  * on: count and sum merge with SUM, min/max with MIN/MAX (averages and
  * rates derive from maintained count+sum at read time; non-decomposable
  * aggregates like exact distinct need a sketch — see
  * [[Sketches.hllRegisters]] for the mergeable-distinct counterpart).
  *
  * Scale shape: the state side is ONE fixed-width row per key and the
  * delta side aggregates down to the same shape before the merge, so the
  * merge shuffle moves two aggregate tables — never raw history, never
  * the new batch's raw rows. A 100 TB history costs nothing per batch;
  * the per-batch bill is the delta scan plus a keys-sized shuffle.
  */
object Incremental {

  /** Merge `state` (the maintained aggregate) with `delta` (the new
    * batch's aggregate, SAME schema): SUM-merge `sumCols` (counts and
    * sums), MIN-merge `minCols`, MAX-merge `maxCols`. Keys present in
    * only one side pass through (a first batch for a new key IS its
    * state). */
  def mergeState(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && (sumCols ++ minCols ++ maxCols).nonEmpty)
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
