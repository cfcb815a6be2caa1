package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Distributed cardinality sketches built from first principles so every
  * bit of sketch state is reproducible in any engine (Spark's built-in
  * `approx_count_distinct` is HLL++ with an opaque register encoding —
  * q19 can only oracle-check its exact twin; this operator's registers,
  * scaled sum and integer micro-unit estimate are mirrored in DuckDB).
  *
  * HyperLogLog (Flajolet et al. 2007), 2^b registers:
  *
  *  - hash: FNV-1a64 of the value, finalized with mix64 — FNV alone has
  *    weak low-bit diffusion and HLL reads bit POSITIONS (bucket prefix,
  *    leading-zero rank), so the finalizer is load-bearing;
  *  - register index: top b bits; rank ρ: leading zeros of the remaining
  *    64-b bits + 1, computed with integer ops only (bin-string length —
  *    no float log anywhere in the sketch);
  *  - merge: max per register — ONE fixed-width partial-aggregated
  *    shuffle of (group, bucket:int, rho:int); the raw corpus never
  *    re-shuffles, and a hot value collapses map-side like any agg;
  *  - estimate: the register sum Σ 2^-M_j is carried as an EXACT integer
  *    scaled by 2^63 in DECIMAL(38,0) (every addend is a dyadic with
  *    exponent ≥ 8, so no addition ever rounds and summation order is
  *    irrelevant — THE trick that makes a float-looking sketch
  *    hash-matchable); the harmonic formula is then one decimal→double
  *    cast and a handful of IEEE ops identical in any engine.
  *
  * Two estimate surfaces are exposed, because they serve different
  * masters:
  *
  *  - `est_micro` + `small_range` — INTEGER-EXACT and cross-engine
  *    hashable: the harmonic estimate in micro-units (×10⁶), computed
  *    entirely by integral division of exact decimals — alpha is carried
  *    as the rational 7213000·m / (10⁴·(1000m+1079)), so
  *    est_micro = (7213·10⁵·m³·2⁶³) div ((1000m+1079)·s_scaled) with no
  *    float anywhere (valid for b ≤ 11, where the scaled numerator fits
  *    DECIMAL(38,0); wider sketches get NULL). `small_range` flags the
  *    rows where HLL prescribes the linear-counting branch, decided by
  *    the same integer comparison in every engine. These are the q45
  *    gate's hashed columns — round 8 proved that hashing any
  *    float-derived column (est_raw was a HUGEINT→DOUBLE cast) trips on
  *    the verifier's cast/libm version even when the sketch state is
  *    bit-identical.
  *  - `est_raw` / `estimate` — the conventional float HLL output for
  *    human consumption. The small-range branch takes a real `ln` (JVM
  *    vs libm: ±1 ulp on 2/1024 inputs, measured), so these columns are
  *    deliberately NOT part of any hashed oracle surface.
  *
  * The 64-bit-hash formulation needs no large-range correction.
  */
object Sketches {

  /** The MERGEABLE sketch state: one (grpCol, bucket, mrho) row per
    * non-empty register. Registers merge with plain MAX — associative and
    * commutative — so sketches built on disjoint slices (sources, days,
    * shards) combine with a `groupBy(bucket).agg(max(mrho))` and estimate
    * exactly as if built over the union in one pass. This is THE property
    * that makes the sketch a 100 TB operator: per-slice states are ≤ m
    * fixed-width rows each, and cross-slice union never rescans data. */
  def hllRegisters(df: DataFrame, grpCol: String, valueCol: String,
      b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits out of range: $b")
    val h = TextExpressions.mix64(
      TextExpressions.fnv1a64(col(valueCol).cast("string")))
    val bucket = shiftrightunsigned(h, 64 - b)
    val rest = h.bitwiseAND(lit((1L << (64 - b)) - 1))
    val rho = lit(64 - b + 1) -
      when(rest === 0, lit(0)).otherwise(length(bin(rest)))
    df.select(col(grpCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col(grpCol), col("bucket"))
      .agg(max(col("rho")).as("mrho"))
  }

  /** Per-group HLL distinct estimate:
    * (grpCol, n_present, s_scaled, est_micro, small_range, est_raw,
    * estimate). */
  def hllDistinct(df: DataFrame, grpCol: String, valueCol: String,
      b: Int = 10): DataFrame =
    hllFromRegisters(hllRegisters(df, grpCol, valueCol, b), grpCol, b)

  /** Estimates from a register table ([[hllRegisters]] output or any
    * MAX-merge of such tables) — same output surface as [[hllDistinct]]. */
  def hllFromRegisters(regs: DataFrame, grpCol: String,
      b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits out of range: $b")
    val m = 1 << b
    // scaled register sum: contribution 2^(63-rho), empty register 2^63
    val twoTo63 = lit(new java.math.BigDecimal("9223372036854775808"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val numer = alpha * (lit((m.toLong * m.toLong).toDouble) *
      lit(9.223372036854775808e18)) // m^2 * 2^63, both powers of two
    regs
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(1L, 63 - mrho)").cast("decimal(38,0)"))
          .as("s_present"))
      .select(col(grpCol), col("n_present"),
        (col("s_present") +
          (lit(m) - col("n_present")).cast("decimal(10,0)") * twoTo63)
          .cast("decimal(38,0)").as("s_scaled"))
      .withColumn("est_micro", {
        // 10⁶·alpha·m²·2⁶³/s with alpha = 7213000·m/(10⁴·(1000m+1079)):
        // numerator 7213·10⁵·m³·2⁶³ (exact), denominator (1000m+1079)·s
        // (exact) — integral division truncates identically in Spark and
        // DuckDB on positive operands
        val nMicro = BigInt(7213) * BigInt(100000) * BigInt(m).pow(3) *
          (BigInt(1) << 63)
        // Bound: est_micro is a BIGINT of 10⁶·estimate, so it is only
        // representable while the estimate stays below ~9.22e12
        // (BIGINT max / 10⁶). Beyond that Spark's non-ANSI decimal div
        // yields NULL while DuckDB's CAST raises — unreachable at any
        // fixture scale (estimate ≤ ~m·2⁶³ would need ~10¹² distincts),
        // but callers comparing engines above that bound must clamp on
        // both sides first.
        if (nMicro.toString.length <= 38)
          expr(s"CAST('$nMicro' AS DECIMAL(38,0)) div " +
            s"(s_scaled * ${1000L * m + 1079})")
        else lit(null).cast("long")
      })
      .withColumn("small_range",
        // NULL est_micro (b ≥ 12: numerator exceeds DECIMAL(38,0)) means
        // the branch decision was never computed — propagate the NULL
        // instead of asserting the harmonic branch
        when(col("est_micro").isNull, lit(null).cast("int"))
          .when(col("est_micro") <= lit(2500000L * m) &&
            col("n_present") < m, lit(1)).otherwise(lit(0)))
      .withColumn("est_raw", numer / col("s_scaled").cast("double"))
      .withColumn("estimate", round(
        when(col("est_raw") <= lit(2.5 * m) && col("n_present") < m,
          lit(m.toDouble) *
            log(lit(m.toDouble) / (lit(m) - col("n_present")).cast("double")))
          .otherwise(col("est_raw")), 4))
  }

  /** KMV (k-minimum-values, "bottom-k theta") distinct sketch: keep the
    * k smallest 64-bit hashes of a group's distinct values; the kth
    * smallest, normalized to (0,1), estimates the cardinality as
    * (k−1)/u (Bar-Yossef et al. 2002; the sketch under Apache DataSketches'
    * theta family). Two sketches MERGE by taking the k smallest of the
    * union of their kept sets — exact, because each of the union's k
    * smallest hashes ranks ≤ k inside its own group too — so per-shard
    * sketches roll up losslessly and set operations (union directly,
    * intersection via inclusion–exclusion) stay estimable at 100 TB.
    * HLL (q45/q51) answers the same question in less space; KMV's kept
    * VALUES are what let it estimate intersections, which HLL cannot.
    *
    * Scale shape: the only full-data work is ONE (group, hash)
    * fixed-width dedup shuffle (map-side partial) plus a count rollup.
    * The bottom-k selection never sorts the data: a threshold prefilter
    * keeps only hashes below −2⁶³ + slack·k/n·2⁶⁴ — expected slack·k
    * survivors per group — and the per-group sort_array runs over those
    * survivors only. The prefilter under-captures only if fewer than k
    * of the n uniform hashes land below slack·k/n:
    * P[Binomial(n, slack·k/n) < k] ≤ e^(−k·(slack−1−ln slack)), at
    * k=256 slack=8 that is e^(−1244) — never. Groups with
    * n ≤ slack·k skip the filter and sketch exactly.
    *
    * @return (grpCol, n_exact, bottom_k — min(k, n) ascending signed
    *         hashes, kmv_est — (k−1)/u, or exactly n when n ≤ k) */
  def kmvBottomK(df: DataFrame, grpCol: String, valueCol: String, k: Int,
      slack: Int = 8): DataFrame = {
    // mix64 finalizer is load-bearing here exactly as in the HLL above:
    // KMV reads hash MAGNITUDES (the kth order statistic), and raw FNV-1a
    // of short strings is far from uniform over the signed-64 range
    // (measured: 2× cardinality bias on numeric-string keys)
    val per = df.select(col(grpCol),
      TextExpressions.mix64(
        TextExpressions.fnv1a64(col(valueCol).cast("string"))).as("h"))
      .dropDuplicates(grpCol, "h")
    val n = per.groupBy(col(grpCol)).agg(count(lit(1)).as("n_exact"))
      .withColumn("thr",
        when(col("n_exact") <= lit(k.toLong * slack), lit(Long.MaxValue))
          .otherwise((lit(-9.223372036854775808e18) +
            lit(slack.toDouble * k) / col("n_exact").cast("double") *
              lit(1.8446744073709551616e19)).cast("long")))
    per.join(broadcast(n), grpCol)
      .filter(col("h") <= col("thr"))
      .groupBy(col(grpCol))
      .agg(first(col("n_exact")).as("n_exact"),
        slice(sort_array(collect_list(col("h"))), 1, k).as("bottom_k"))
      .withColumn("kmv_est",
        kmvEstimate(col("n_exact"), col("bottom_k"), k))
  }

  /** The KMV estimate from a bottom-k array: exact count when the whole
    * group fit in the sketch, else (k−1)/u with u the kth smallest hash
    * normalized from signed-64 to (0,1). Written with the exact IEEE
    * operation order the q54 oracle mirrors (the constants parse to 2⁶³
    * and 2⁶⁴ exactly in both engines). */
  def kmvEstimate(nExact: Column, bottomK: Column, k: Int): Column =
    when(nExact <= lit(k.toLong), round(nExact.cast("double"), 4))
      .otherwise(round(lit((k - 1).toDouble) /
        ((element_at(bottomK, k).cast("double") +
          lit(9.223372036854775808e18)) / lit(1.8446744073709551616e19)),
        4))
}
