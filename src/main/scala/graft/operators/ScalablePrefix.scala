package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact global running aggregates WITHOUT a single-partition window.
  *
  * Every `Window.orderBy`-without-partitionBy in this repo is pinned
  * bounded (GLOBAL-WINDOW audit, `GlobalWindowAuditSpec`) and several of
  * those pins name "repartitionByRange + per-partition prefix +
  * broadcast offsets" as the restructure path if a frame ever stops
  * being bounded. This operator IS that path, reusable and tested — the
  * two-phase distributed prefix sum (the textbook scan algorithm over
  * range partitions):
  *
  *  1. range-partition on the order key and sort within partitions —
  *     partition i holds keys strictly below partition i+1's;
  *  2. one bounded pass emits each partition's local sum (exactly
  *     `numPartitions` rows to the driver — the bounded-collect
  *     discipline, loud guard included);
  *  3. exclusive-prefix those sums into per-partition offsets;
  *  4. a second pass adds offset + intra-partition running sum.
  *
  * No WindowExec appears in the physical plan (pinned in
  * `PlanQualitySpec`); the only shuffle is the range exchange, and every
  * partition's work is O(|partition|). At 100 TB the same plan holds:
  * the driver sees `numPartitions` longs, never rows.
  *
  * The order key must be UNIQUE: equal keys can straddle a range
  * boundary nondeterministically, which would make "running sum at key
  * k" ill-defined. The ranged frame is localCheckpoint'ed so both
  * passes read the SAME sampled range bounds (RangePartitioner samples;
  * a recompute could re-draw boundaries between the passes).
  */
object ScalablePrefix {

  /** (orderCol, valueCol, run_sum) for every input row, where run_sum =
    * Σ value over all rows with order key ≤ this row's. Long arithmetic;
    * the caller owns overflow headroom (Σ|value| must fit int64). */
  /** Stage 1 in isolation (package-visible so `ScalablePrefixSpec` can
    * pin the range exchange in ITS plan — the localCheckpoint in
    * [[cumSum]] truncates lineage, so the exchange is invisible from
    * the final consumer plan). */
  private[operators] def ranged(df: DataFrame, orderCol: String,
      valueCol: String, numPartitions: Int)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(orderCol).cast("long").as("k"),
        col(valueCol).cast("long").as("v"))
      .repartitionByRange(numPartitions, col("k"))
      .sortWithinPartitions("k")
      .as[(Long, Long)]
  }

  def cumSum(df: DataFrame, orderCol: String, valueCol: String,
      numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rangedCp = ranged(df, orderCol, valueCol, numPartitions)
      .localCheckpoint()

    // bounded driver materialization: one (partitionId, localSum) row
    // per partition — numPartitions longs, never data rows
    val partSums = rangedCp.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.get().partitionId(), s))
    }.collect()
    require(partSums.length <= 65536,
      s"cumSum partition census ${partSums.length} exceeds the bounded-" +
        "collect guard — numPartitions is driver-sized, keep it so")

    val offsets = new Array[Long](numPartitions)
    partSums.sortBy(_._1).foreach { case (pid, s) =>
      if (pid + 1 < numPartitions) offsets(pid + 1) = s
    }
    var i = 1
    while (i < numPartitions) { offsets(i) += offsets(i - 1); i += 1 }
    val bcast = spark.sparkContext.broadcast(offsets)

    rangedCp.mapPartitions { it =>
      var acc = bcast.value(TaskContext.get().partitionId())
      it.map { case (k, v) => acc += v; (k, v, acc) }
    }.toDF(orderCol, valueCol, "run_sum")
  }
}
