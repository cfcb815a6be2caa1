package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/compression operators.
  *
  * At 100 TB the embedding column dominates storage (a 64-dim float vector
  * is 256 bytes/row before encoding); symmetric int8 quantization cuts it
  * 4× and is the standard serving-index format (FAISS SQ8, ScaNN int8).
  * Everything here is built from codegen'd higher-order expressions —
  * narrow, no shuffle, no UDF — and the arithmetic is deliberately
  * mirrorable: `floor(x·scale + 0.5)` rounding (no banker's-rounding
  * divergence across engines) over exact double ops, so quantized outputs
  * verify bit-for-bit in any engine.
  */
object Embeddings {

  /** Per-vector symmetric scale: 127 / max|x| (1.0 for all-zero vectors,
    * making dequantization a no-op rather than a division by zero). */
  def int8Scale(vec: Column): Column = {
    val am = array_max(transform(vec, x => abs(x.cast("double"))))
    when(am > 0d, lit(127d) / am).otherwise(lit(1d))
  }

  /** Quantize to [-127, 127] longs with round-half-up (floor(x+0.5) —
    * identical semantics in every engine, unlike round()'s half-even).
    * By construction |x|·scale ≤ 127, so no clipping branch is needed. */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x.cast("double") * scale + lit(0.5d)).cast("long"))

  /** (idCol, scale, qvec) — the stored form. Narrow projection. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scaled = df.select(col(idCol), col(vecCol).as("v"),
      int8Scale(col(vecCol)).as("scale"))
    scaled.select(col(idCol), col("scale"),
      int8Quantize(col("v"), col("scale")).as("qvec"))
  }

  /** Quantization accounting per vector: the exact integer moments of the
    * quantized vector (qsum, qnorm — bulletproof cross-engine) plus the
    * double-precision reconstruction MSE (sequential fold, rounded). The
    * audit a pipeline runs before swapping an index to int8. */
  def quantizationStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scaled = df.select(col(idCol), col(vecCol).as("v"),
      int8Scale(col(vecCol)).as("scale"))
    val q = scaled.select(col(idCol), col("v"), col("scale"),
      int8Quantize(col("v"), col("scale")).as("qv"))
    q.select(col(idCol),
      round(col("scale"), 6).as("qscale"),
      aggregate(col("qv"), lit(0L), (a, x) => a + x).as("qsum"),
      aggregate(col("qv"), lit(0L), (a, x) => a + x * x).as("qnorm"),
      round(
        aggregate(
          zip_with(col("v"), col("qv"), (x, qi) => {
            val err = x.cast("double") - qi.cast("double") / col("scale")
            err * err
          }),
          lit(0d), (a, x) => a + x) / size(col("v")).cast("double"),
        6).as("mse"))
  }

  /** Per-DIMENSION distribution drift between two embedding slices — the
    * monitor a pipeline runs when a new encoder version, data source, or
    * ingest day lands: has the embedding distribution moved? Components
    * quantize to floor(x·2¹²) longs, so per-dim counts / sums /
    * sums-of-squares are EXACT integers that merge across shards by
    * addition, and the mean-shift test is a pure integer
    * cross-multiplication —
    *
    *   drift(dim)  ⇔  |sumA·nB − sumB·nA| · (1000/thresholdMilli)
    *                      >  nA·nB·2¹²
    *
    * i.e. |meanA − meanB| > thresholdMilli/1000 in original units, with
    * no float division anywhere, so the verdict mirrors bit-for-bit.
    *
    * Scale shape: one narrow pass per slice (posexplode → partial agg),
    * state = dims rows per slice — at 100 TB drift monitoring is a
    * metadata join of two dim-bounded summary tables. Overflow safety:
    * components quantize at 2¹² (so with |x| < 2 the per-dim
    * sum-of-squares stays in Long past 2³⁰ rows per slice), and the
    * cross-multiplied comparison — whose products scale with n² — runs
    * in DECIMAL(38,0) (mirrored as HUGEINT), exact to ~10³⁸. */
  def driftStats(a: DataFrame, b: DataFrame, vecCol: String,
      thresholdMilli: Int = 5): DataFrame = {
    require(thresholdMilli > 0 && 1000 % thresholdMilli == 0,
      s"thresholdMilli must divide 1000: $thresholdMilli")
    val scale = (1L << 12).toDouble
    def moments(df: DataFrame, p: String) = df
      .select(posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale)).cast("long")))
        .as(Seq("dim", "q")))
      .groupBy("dim")
      .agg(count(lit(1)).as(s"n_$p"), sum(col("q")).as(s"sum_$p"),
        sum(col("q") * col("q")).as(s"ssq_$p"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    moments(a, "a").join(moments(b, "b"), "dim")
      .withColumn("drift",
        abs(dec(col("sum_a")) * dec(col("n_b"))
            - dec(col("sum_b")) * dec(col("n_a")))
          * lit(1000L / thresholdMilli)
          > dec(col("n_a")) * dec(col("n_b")) * lit(1L << 12))
      .orderBy("dim")
  }

  /** Simplified (centroid-based) SILHOUETTE score per cluster — the
    * clustering-quality number an IVF/k-means pipeline reports after
    * training (Rousseeuw 1987's medoid shortcut, the O(n·K) variant
    * every large-scale evaluator uses instead of the O(n²) original).
    * Every vector is assigned to its nearest centroid (a² = that squared
    * distance, ties → lowest centroid id) and contrasted with the best
    * OTHER centroid (b²); its score is (b² − a²)/max(a², b²) ∈ [0, 1] —
    * the squared-distance silhouette, 0 = on a cluster boundary,
    * → 1 = deep inside its cluster.
    *
    * Exactness: vectors quantize to integers by ⌊x·scale + 0.5⌋ (one
    * global scale, so distances are cross-vector comparable — unlike
    * [[int8Quantize]]'s per-vector scale), distances are integer sums of
    * squares, and the score is a ×10⁶-scaled DECIMAL integral division —
    * bit-mirrorable end to end.
    *
    * Scale shape: K centroids broadcast once; the n×K distance pass is
    * a map-only zip_with fold; per-vector argmin and the per-cluster
    * rollup are partial aggs. No shuffle ever carries a vector wider
    * than (id, two longs).
    *
    * @return (cluster, n_points, sil_sum_micro, avg_sil_micro), one row
    *         per non-empty cluster. */
  def clusterSilhouette(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      scale: Int = 1024): DataFrame = {
    def quant(c: Column) = transform(c,
      x => floor(x.cast("double") * scale + lit(0.5d)).cast("long"))
    val v = df.select(col(idCol).cast("long").as("vid"),
      quant(col(vecCol)).as("qv"))
    val cs = centroids.select(col(cidCol).cast("long").as("cid"),
      quant(col(cvecCol)).as("cq"))
    // b² (best OTHER centroid) inner-joins against a²: with K=1 (one
    // DISTINCT cid — duplicate centroid rows don't count) there is no
    // other centroid and every vector would silently vanish — the
    // silhouette is undefined for a single cluster, so fail loudly. The
    // probe is one tiny job over the centroid frame (K rows by contract).
    require(cs.select("cid").distinct().limit(2).count() >= 2,
      "clusterSilhouette needs >= 2 distinct centroid ids (silhouette " +
        "is undefined for a single cluster)")
    val d = v.crossJoin(broadcast(cs))
      .select(col("vid"), col("cid"),
        aggregate(zip_with(col("qv"), col("cq"),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
    val m1 = d.groupBy("vid")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vid"), col("m.d2").as("a2"), col("m.cid").as("acid"))
    val b2 = d.join(m1, "vid").filter(col("cid") =!= col("acid"))
      .groupBy("vid").agg(min(col("d2")).as("b2"))
    m1.join(b2, "vid")
      .select(col("vid"), col("acid"), col("a2"), col("b2"),
        expr("""coalesce(cast(((cast(b2 as decimal(38,0)) - a2) * 1000000)
                 div nullif(cast(greatest(a2, b2) as decimal(38,0)), 0)
                 as bigint), 0L)""").as("sil_micro"))
      .groupBy(col("acid").as("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("sil_micro")).as("sil_sum_micro"))
      .withColumn("avg_sil_micro", expr("sil_sum_micro div n_points"))
  }
}
