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
  /** The long casts below TRUNCATE fractional inputs — a double order
    * key would silently merge distinct keys and violate the unique-key
    * precondition with no error (ADVICE r19), so integral-ness is a
    * loud analysis-time requirement, not a convention. */
  private def requireIntegral(df: DataFrame, c: String, role: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
      s"ScalablePrefix $role column '$c' must be integral (got $dt): " +
        "the long cast would truncate and merge distinct keys silently")
  }

  private[operators] def ranged(df: DataFrame, orderCol: String,
      valueCol: String, numPartitions: Int)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    requireIntegral(df, orderCol, "order")
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

  /** Tie-safe running sum (VERDICT r19 #4): ROWS-frame semantics over the
    * compound key (orderCol, tieCol) — run_sum = Σ value over all rows
    * with (order, tie) lexicographically ≤ this row's, i.e. exactly
    * `sum(v) OVER (ORDER BY orderCol, tieCol ROWS UNBOUNDED PRECEDING)`.
    * [[cumSum]]'s unique-key restriction exists because equal order keys
    * can straddle a range boundary nondeterministically; ranging and
    * sorting on the COMPOUND key makes every row's position total again,
    * so duplicate-heavy order keys are safe as long as (order, tie) is
    * unique — the usual shape: order by a coarse bucket/score, break ties
    * by the row id. Same scale contract as cumSum: the driver sees
    * `numPartitions` longs, no WindowExec, one range exchange.
    */
  def cumSumTieSafe(df: DataFrame, orderCol: String, tieCol: String,
      valueCol: String, numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireIntegral(df, orderCol, "order")
    requireIntegral(df, tieCol, "tie-break")
    val rangedCp = df
      .select(col(orderCol).cast("long").as("k"),
        col(tieCol).cast("long").as("t"),
        col(valueCol).cast("long").as("v"))
      .repartitionByRange(numPartitions, col("k"), col("t"))
      .sortWithinPartitions("k", "t")
      .as[(Long, Long, Long)]
      .localCheckpoint()

    val partSums = rangedCp.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._3)
      Iterator.single((TaskContext.get().partitionId(), s))
    }.collect()
    require(partSums.length <= 65536,
      s"cumSumTieSafe partition census ${partSums.length} exceeds the " +
        "bounded-collect guard — numPartitions is driver-sized, keep it so")

    val offsets = new Array[Long](numPartitions)
    partSums.sortBy(_._1).foreach { case (pid, s) =>
      if (pid + 1 < numPartitions) offsets(pid + 1) = s
    }
    var i = 1
    while (i < numPartitions) { offsets(i) += offsets(i - 1); i += 1 }
    val bcast = spark.sparkContext.broadcast(offsets)

    rangedCp.mapPartitions { it =>
      var acc = bcast.value(TaskContext.get().partitionId())
      it.map { case (k, t, v) => acc += v; (k, t, v, acc) }
    }.toDF(orderCol, tieCol, valueCol, "run_sum")
  }

  /** Rank + running sum over (long order key, STRING tie-break) — the
    * shape of the repo's largest-frame audited global window,
    * `TextAnalysis.vocabCoverage`'s vocabulary ranking (order by count
    * desc — pass the negated count — tie-break by the word itself):
    * exactly `row_number() OVER (ORDER BY orderCol, tieCol)` plus
    * `sum(v) OVER (… ROWS UNBOUNDED PRECEDING)`, with no WindowExec.
    * Same construction as [[cumSumTieSafe]] with a per-partition ROW
    * census alongside the value census, so both rank and sum get
    * broadcast offsets. (orderCol, tieCol) must be unique per row. */
  def rankedCumSum(df: DataFrame, orderCol: String, tieCol: String,
      valueCol: String, numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireIntegral(df, orderCol, "order")
    require(df.schema(tieCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"rankedCumSum tie-break column '$tieCol' must be a string (got " +
        s"${df.schema(tieCol).dataType}); use cumSumTieSafe for integral ties")
    val rangedCp = df
      .select(col(orderCol).cast("long").as("k"), col(tieCol).as("t"),
        col(valueCol).cast("long").as("v"))
      .repartitionByRange(numPartitions, col("k"), col("t"))
      .sortWithinPartitions("k", "t")
      .as[(Long, String, Long)]
      .localCheckpoint()

    val census = rangedCp.mapPartitions { it =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; s += r._3 }
      Iterator.single((TaskContext.get().partitionId(), n, s))
    }.collect()
    require(census.length <= 65536,
      s"rankedCumSum partition census ${census.length} exceeds the " +
        "bounded-collect guard — numPartitions is driver-sized, keep it so")

    val rankOff = new Array[Long](numPartitions)
    val sumOff = new Array[Long](numPartitions)
    census.sortBy(_._1).foreach { case (pid, n, s) =>
      if (pid + 1 < numPartitions) { rankOff(pid + 1) = n; sumOff(pid + 1) = s }
    }
    var i = 1
    while (i < numPartitions) {
      rankOff(i) += rankOff(i - 1); sumOff(i) += sumOff(i - 1); i += 1
    }
    val bcast = spark.sparkContext.broadcast((rankOff, sumOff))

    rangedCp.mapPartitions { it =>
      val pid = TaskContext.get().partitionId()
      var rk = bcast.value._1(pid)
      var acc = bcast.value._2(pid)
      it.map { case (k, t, v) =>
        rk += 1; acc += v; (k, t, v, rk, acc)
      }
    }.toDF(orderCol, tieCol, valueCol, "rank", "run_sum")
  }
}
