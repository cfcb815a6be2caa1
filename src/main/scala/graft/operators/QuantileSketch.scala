package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KLL-style mergeable quantile sketch with DERANDOMIZED compaction —
  * rank-accurate quantiles over arbitrary slice unions without ever
  * sorting the data.
  *
  * KLL (Karnin, Lang, Liberty 2016) keeps a hierarchy of compactors:
  * an item survives to level t with probability 2^-t, and a kept item
  * at level t stands for 2^t originals. The classic sketch flips coins
  * per compaction, which makes the state depend on arrival order. Here
  * the coin is DERANDOMIZED the way this repo derandomizes everything
  * (q51's registers, s06's buckets): an item's survival level is a pure
  * function of its unique key —
  *
  *   lvl(x) = trailing-zero bits of FNV-1a64(key), capped at `maxLevel`
  *
  * so P(lvl ≥ t) = 2^-t over the hash family, yet the level is a column
  * expression any engine reproduces bit-for-bit. A sketch at threshold
  * t is simply {x : lvl(x) ≥ t} with weight 2^t per item, where t is
  * the smallest threshold whose keep-set fits `capacity`.
  *
  * Why this merges EXACTLY (the property the q53 oracle proves): the
  * keep-set at threshold t is a pure filter, monotone in t, and the
  * threshold function t(S) = min{t : |{x∈S : lvl(x) ≥ t}| ≤ B} is
  * monotone in S under union. So for slices S₁…Sₖ, every per-slice
  * threshold t(Sᵢ) ≤ t(∪Sᵢ), which means the union of per-slice
  * keep-sets still contains every item with lvl ≥ t(∪Sᵢ); re-applying
  * the threshold rule over the union (restricted to t ≥ max t(Sᵢ) — the
  * merged state has no information below its floor) lands exactly on
  * t(∪Sᵢ) and exactly the direct sketch's rows. Merging is therefore a
  * union + tiny re-threshold, associative and order-independent — the
  * same state can roll up day→month→year with no accuracy cliff.
  *
  * Rank estimation: est_rank(v) = |{kept x : val(x) ≤ v}| · 2^t. The
  * standard subsampling bound gives additive rank error O(√(2^t·N)) —
  * with capacity B that is ≈ N/√B, i.e. a ~2% band at B = 2048 —
  * measured and pinned in the spec, and computed IDENTICALLY by the
  * DuckDB oracle (the band boolean mirrors; it is not a constant).
  *
  * 100 TB shape: the level column is codegen'd integer arithmetic on a
  * scan; level COUNTS are a map-side partial agg collapsing to
  * ≤ slices·(maxLevel+1) rows; thresholds are decided on that summary
  * and broadcast back; the keep filter is the only other pass over
  * data. Sketch state is ≤ B fixed-width rows per slice — percentile
  * tracking across arbitrary slice unions is a metadata operation, and
  * the readout window runs over the ≤ B-row summary, never over data
  * (the q52 discipline, now rank-accurate for heavy-tailed columns
  * where equi-width buckets fail). */
object QuantileSketch {

  val DefaultMaxLevel = 20

  /** Survival level of an item: the number of low-order zero bits of
    * FNV-1a64(key-as-string), capped at `maxLevel`. Trailing zeros via
    * the branch-free mask trick — m = low (maxLevel+1) bits of the hash;
    * m = 0 means every countable bit is zero (capped), otherwise
    * `bit_count(m XOR (m-1)) - 1` counts them — two codegen'd builtins
    * instead of a maxLevel-clause CASE chain. Low bits of the signed
    * long match the unsigned hash, so the DuckDB HUGEINT mirror agrees
    * bit-for-bit (masking first also keeps bit_count inside DuckDB's
    * TINYINT return range). */
  def levelOf(key: Column, maxLevel: Int = DefaultMaxLevel): Column =
    levelOfHash(
      graft.functions.TextExpressions.fnv1a64(key.cast("string")), maxLevel)

  /** The trailing-zero fold over an already-computed hash column —
    * callers that stage the hash in its own projection (see
    * [[withLevels]]) evaluate the string fold once per row. */
  def levelOfHash(h: Column, maxLevel: Int = DefaultMaxLevel): Column = {
    val m = h.bitwiseAND(lit((1L << (maxLevel + 1)) - 1))
    when(m === 0L, lit(maxLevel))
      .otherwise(bit_count(m.bitwiseXOR(m - 1)) - 1)
  }

  /** (slice, key, value, lvl) — the scan-side projection every other
    * step derives from. `key` must be unique per row (duplicated values
    * are sampled independently, as KLL requires). The FNV hash is staged
    * as its own projection column so the trailing-zero expression
    * references it instead of re-evaluating the string fold per use
    * (CollapseProject keeps the two projections apart because the hash
    * is non-cheap and multiply-referenced). */
  def withLevels(df: DataFrame, slice: Column, key: Column, value: Column,
      maxLevel: Int = DefaultMaxLevel): DataFrame =
    df.select(slice.as("slice"), key.cast("long").as("key"),
      value.as("value"))
      .withColumn("__h",
        graft.functions.TextExpressions.fnv1a64(col("key").cast("string")))
      .withColumn("lvl", levelOfHash(col("__h"), maxLevel))
      .drop("__h")

  /** Per-(slice, lvl) counts — the partial-agg summary thresholds are
    * decided on (≤ slices·(maxLevel+1) rows at any data size). */
  def levelCounts(levels: DataFrame): DataFrame =
    levels.groupBy("slice", "lvl").agg(count(lit(1)).as("cnt"))

  /** Per-slice threshold: the smallest t ≥ `tFloor` whose tail count
    * |{lvl ≥ t}| fits `capacity`. Candidate thresholds run to
    * maxLevel+1, where the tail is 0 by construction (levels are capped
    * at maxLevel), so a threshold always exists. Input is the tiny
    * [[levelCounts]] summary; output is one (slice, t_slice) row per
    * slice. */
  def thresholds(levelCounts: DataFrame, capacity: Int,
      maxLevel: Int = DefaultMaxLevel,
      floor: Option[DataFrame] = None): DataFrame = {
    val cand0 = levelCounts.select("slice").distinct()
      .select(col("slice"),
        explode(sequence(lit(0), lit(maxLevel + 1))).as("t"))
    // a MERGED sketch carries no information below its floor (per-slice
    // thresholds already dropped those levels), so its re-threshold must
    // search t >= floor only — restricted there, merged tail counts equal
    // direct ones and the rule lands exactly on the direct threshold
    val cand = floor match {
      case Some(f) =>
        cand0.crossJoin(broadcast(f)).filter(col("t") >= col("tf")).drop("tf")
      case None => cand0
    }
    cand.join(levelCounts, Seq("slice"), "left")
      .groupBy("slice", "t")
      .agg(coalesce(
        sum(when(col("lvl") >= col("t"), col("cnt")).otherwise(lit(0L))),
        lit(0L)).as("tail"))
      .filter(col("tail") <= capacity)
      .groupBy("slice").agg(min(col("t")).as("t_slice"))
  }

  /** Quantile readout over a final (already-thresholded) sketch:
    * est(p) = the smallest kept value whose estimated rank
    * row_number·2^t reaches ceil(p‰·N), falling back to the largest
    * kept value when the sketch's total weight undershoots N (a
    * ±O(√(2^t·N)) sampling effect near p → 1). `tMerged` and `nTotal`
    * are one-row frames (t_m BIGINT, n_total BIGINT); the window runs
    * over the ≤ capacity kept rows only. */
  def estQuantiles(kept: DataFrame, tMerged: DataFrame, nTotal: DataFrame,
      pMilles: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // GLOBAL-WINDOW: bounded — ranks the ≤`capacity` KEPT sketch rows
    // (scaladoc contract above), never the sketched corpus
    val w = Window.orderBy(col("value"), col("key"))
    val ranked = kept.withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tMerged))
      .withColumn("est_rank",
        col("rn") * expr("shiftleft(cast(1 as bigint), cast(t_m as int))"))
    val ps = kept.sparkSession.createDataFrame(
      pMilles.map(Tuple1(_))).toDF("p_mille")
    val maxVal = ranked.agg(max(col("value")).as("fallback"))
    ps.crossJoin(broadcast(nTotal))
      .withColumn("target", expr("(n_total * p_mille + 999) div 1000"))
      .join(ranked, col("est_rank") >= col("target"), "left")
      .groupBy("p_mille", "n_total", "target")
      .agg(min(col("value")).as("est_value"))
      .crossJoin(broadcast(maxVal))
      .select(col("p_mille"), col("n_total"), col("target"),
        coalesce(col("est_value"), col("fallback")).as("est_value"))
  }
}
