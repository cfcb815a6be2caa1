package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]]: exact cosine against a broadcast query vector —
  *   O(n) scan, the correctness baseline. The query vector travels as a
  *   literal, so the plan is a pure projection + TakeOrderedAndProject
  *   (no shuffle of the table).
  * - [[lshTopK]]: the scale path — candidates are rows sharing at least one
  *   sign-random-projection band bucket with the query, exact cosine only
  *   on candidates. At 100 TB with a bucketed/partitioned layout on the
  *   band keys, this prunes the scan to matching partitions.
  */
object Similarity {

  private def vecLit(q: Array[Double]) = array(q.toIndexedSeq.map(lit): _*)

  /** Exact top-k by cosine vs a constant query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol).as("vec_id"),
      round(VectorFunctions.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  /** ANN top-k: band-bucket candidates, exact rank among them. Recall is
    * tuned by (bandBits ↓, bandCount ↑).
    *
    * This is the FLOAT-projection resolution mode — an opt-in variant of
    * the default ANN path [[quantizedLshTopK]]. Same banding semantics;
    * the float dot products preserve slightly more resolution but make
    * bucket membership IEEE-summation-order dependent, so results can
    * only be verified by recall bound, never mirrored exactly. Prefer
    * the quantized default unless continuous projections matter. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, bandBits: Int = 8, bandCount: Int = 8,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    // query's band buckets, computed once on the driver through the same
    // expression the rows use (no skew: tiny literal map pushed into filter)
    val qdf = spark.range(1).select(
      (0 until bandCount).map(b =>
        VectorFunctions.embLshBucket(vecLit(query), bandBits, seed + b)
          .as(s"q$b")): _*)
    val qBuckets = qdf.collect().head
    val qb = (0 until bandCount).map(b => qBuckets.getInt(b))

    val candidate = (0 until bandCount).map(b =>
      VectorFunctions.embLshBucket(col(vecCol), bandBits, seed + b) === lit(qb(b)))
      .reduce(_ || _)

    df.filter(candidate)
      .select(col(idCol).as("vec_id"),
        round(VectorFunctions.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  // ------------------------------------------------- quantized LSH (s06)
  // Fixed-point sign-projection LSH whose bucket assignment is EXACT
  // integer arithmetic end to end: components quantize to floor(x·128),
  // projection coefficients come from an integer LCG of the flat
  // (band, bit, dim) index, and the projection is an integer dot product —
  // no float summation order anywhere, so any engine (DuckDB, a different
  // Spark build, a GPU port) reproduces the buckets bit-for-bit. This is
  // the DEFAULT ANN path: identical banding semantics to the float
  // sign-LSH in [[lshTopK]] with a fully checkable result set ([[lshTopK]]
  // remains an opt-in resolution mode for continuous projections).

  // single source of truth: the kernel constants in VectorFunctions —
  // aliased here so the declarative executable spec below can never
  // drift from the production kernels by a one-sided edit
  private val QlshScale = VectorFunctions.QlshScale
  private val QlshMul = VectorFunctions.QlshMul
  private val QlshInc = VectorFunctions.QlshInc
  private val QlshMod = VectorFunctions.QlshMod

  /** Driver-side bucket replica for the query vector (and for tests):
    * the same kernel ([[VectorFunctions.qlshBucketsOf]]) the column
    * expressions run, so query and corpus agree by construction. */
  def quantizedBuckets(query: Array[Double], bandBits: Int,
      bandCount: Int): Seq[Long] =
    VectorFunctions.qlshBucketsOf(query, bandBits, bandCount).toSeq

  /** One band's bucket as a DECLARATIVE column — retained as the
    * executable spec of the quantized-LSH arithmetic (LlmOpsSpec pins it
    * equal to the codegen'd [[VectorFunctions.qlshSignature]] kernel and
    * the driver replica, bit for bit). Production paths use the kernel:
    * this form re-evaluates the interpreted quantization per band per
    * row (the r13 s12 scale-killer). */
  def quantizedLshBucket(vec: org.apache.spark.sql.Column, bandBits: Int,
      band: Int): org.apache.spark.sql.Column = {
    val qv = transform(vec, x => floor(x.cast("double") * lit(QlshScale)).cast("long"))
    val dims = size(vec).cast("long")
    (0 until bandBits).map { bit =>
      val base = (lit(band.toLong * bandBits + bit) * dims).cast("long")
      val proj = aggregate(
        transform(qv, (x, i) =>
          x * (pmod((base + i.cast("long")) * lit(QlshMul) + lit(QlshInc),
            lit(QlshMod)) - lit((QlshMod - 1) / 2))),
        lit(0L), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k with integer-exact bucket assignment — same candidate
    * semantics as [[lshTopK]] (share ≥ 1 of bandCount band buckets with
    * the query), exact cosine rank among candidates, but every bucket
    * decision is mirrorable SQL, so the whole query is oracle-checkable. */
  def quantizedLshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, bandBits: Int = 4,
      bandCount: Int = 8): DataFrame = {
    val qb = quantizedBuckets(query, bandBits, bandCount)
    df.filter(VectorFunctions.qlshAnyMatch(col(vecCol), qb, bandBits))
      .select(col(idCol).as("vec_id"),
        round(VectorFunctions.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nlist` deterministic
    * centroid vectors partitions the corpus into cells; a query searches
    * only its `nprobe` nearest cells with exact cosine.
    *
    * At scale the assignment is computed once and persisted partitioned by
    * `cell`, so a query prunes to nprobe/nlist of the data before any
    * distance math — the complementary scale path to sign-LSH banding
    * (IVF: few coarse cells, good for clustered corpora; LSH: many hash
    * buckets, good for high-similarity retrieval).
    *
    * Centroid seeding is a deterministic pseudo-random sample of the
    * corpus (the `nlist` rows with the smallest xxhash64(id) — uniform
    * over the corpus, stable run to run), refined by `lloydIters` k-means
    * iterations over a deterministic TRAINING sample of
    * `nlist * trainFactor` rows (same hash ordering — at 100 TB the
    * refinement cost is sample-bounded, never corpus-bounded). Each
    * iteration is two DataFrame jobs: nearest-centroid assignment, then a
    * per-(cell, dim) mean computed as FIXED-POINT LONG sums — integer
    * addition commutes, so the refined centroids are bit-identical
    * regardless of partitioning, keeping the whole index reproducible
    * (the repo-wide mirrorable-arithmetic pattern). Every driver collect
    * is bounded: nlist seed rows, then nlist·dims aggregate rows. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      lloydIters: Int = 2, trainFactor: Int = 64): DataFrame =
    ivfTopKWith(df, idCol, vecCol,
      ivfCentroids(df, idCol, vecCol, nlist, lloydIters, trainFactor),
      query, k, nprobe)

  /** [[ivfTopK]] against PREBUILT centroids — the index-reuse entry
    * point: a parameter sweep (s21) or a repeated-query workload trains
    * the coarse quantizer ONCE and probes many times, instead of paying
    * the seed-collect + Lloyd corpus scans per call (the same
    * train-once contract as [[mipsTopKQuantized]]'s `maxNorm2`). */
  def ivfTopKWith(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Double])], query: Array[Double],
      k: Int, nprobe: Int): DataFrame = {
    // probeCells returns tuple ids while nearestCentroid assigns by array
    // POSITION — a reordered/filtered centroid array would silently probe
    // the wrong cells, so the id==index invariant is enforced, not assumed
    require(centroids.zipWithIndex.forall { case ((id, _), i) => id == i },
      "ivfTopKWith requires centroids(i) = (i, vec) — ids must equal array " +
        "positions, as produced by ivfCentroids; do not reorder or filter")
    val probed = probeCells(centroids, query, nprobe)

    // assignment: argmax cosine over the centroid matrix — a single native
    // expression carrying the matrix as state (same argmax/tie semantics as
    // a sort_array-of-(negcos,cell) formulation, without a thousands-of-
    // nodes literal tree for the optimizer to re-walk per run)
    val centroidMatrix = centroids.map(_._2) // index == cell id
    val assigned = df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("cell", VectorFunctions.nearestCentroid(col("vec"), centroidMatrix))

    assigned.filter(col("cell").isin(probed.toSeq: _*))
      .select(col("vec_id"),
        round(VectorFunctions.cosine(col("vec"), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Driver-side cosine over two small dense vectors (centroid probing). */
  private def cosArr(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  /** The `nprobe` cell ids whose centroids are nearest the query —
    * driver-side over the tiny centroid table, SHARED by every IVF
    * variant (flat and PQ) so the probe metric and tie-break can never
    * drift between the two paths. */
  private[graft] def probeCells(centroids: Array[(Int, Array[Double])],
      query: Array[Double], nprobe: Int): Set[Int] =
    centroids.sortBy { case (_, c) => -cosArr(query, c) }
      .take(nprobe).map(_._1).toSet

  /** The IVF coarse quantizer: deterministic seed sample + Lloyd
    * refinement (see [[ivfTopK]]). Exposed for the cell-balance spec and
    * for callers that persist the assignment partitioned by cell. */
  def ivfCentroids(df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, lloydIters: Int = 2,
      trainFactor: Int = 64): Array[(Int, Array[Double])] = {
    // deterministic centroid sample (small: nlist rows to the driver);
    // the (hash, id) sort makes the collect order — and so cell numbering
    // — independent of partition merge order
    val seeds: Array[(Int, Array[Double])] = df
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .orderBy(xxhash64(col("cid")), col("cid"))
      .limit(nlist)
      .collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Any](1).map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
        }.toArray
      }
    if (lloydIters <= 0) seeds
    else {
      val train = df
        .select(col(idCol).as("cid"), col(vecCol).as("vec"))
        .orderBy(xxhash64(col("cid")), col("cid"))
        .limit(nlist * trainFactor)
        .select("vec")
        .cache()
      val refined = lloydRefine(train, "vec", seeds.map(_._2), lloydIters)
      train.unpersist()
      refined.zipWithIndex.map { case (c, i) => i -> c }
    }
  }

  /** Per-row cell assignment under the refined quantizer: (vec_id, cell).
    * The persist-me-partitioned-by-cell output of an IVF build. */
  private[graft] def ivfAssignments(df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, lloydIters: Int = 2,
      trainFactor: Int = 64): DataFrame = {
    val centroids = ivfCentroids(df, idCol, vecCol, nlist, lloydIters,
      trainFactor)
    df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("cell",
        VectorFunctions.nearestCentroid(col("vec"), centroids.map(_._2)))
      .select("vec_id", "cell")
  }

  /** Fixed-point scale for Lloyd means: components quantize to
    * floor(x·2²⁴) longs, so per-(cell, dim) sums are exact integer
    * arithmetic — commutative, hence partition-order independent. With
    * |x| ≲ 2⁷ and sample counts ≤ 2³² the sums stay far from Long range. */
  private val LloydScale = (1L << 24).toDouble

  /** `iters` k-means refinements of `centroids` over `train` (a bounded,
    * deterministic sample — cached by the caller). Assignment is the same
    * [[VectorFunctions.nearestCentroid]] kernel queries use; the mean is a
    * per-(cell, dim) long-sum aggregate whose collect is exactly
    * nlist·dims rows. Cells that lose all members keep their previous
    * centroid (no respawn heuristics — deterministic).
    *
    * Cost shape: each iteration re-evaluates `nearestCentroid` over the
    * FULL train sample with the current centroid matrix shipped as
    * expression state — fine at the default nlist·trainFactor (≤ ~1k
    * rows per plan), but the per-iteration cost is
    * O(|train| · nlist · dims); a caller raising `trainFactor` by orders
    * of magnitude should persist `train` (it is re-scanned `iters`
    * times) and expect assignment, not aggregation, to dominate. */
  private def lloydRefine(train: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    var cur = centroids
    for (_ <- 0 until iters) {
      val sums = train
        .withColumn("cell", VectorFunctions.nearestCentroid(col(vecCol), cur))
        .select(col("cell"), posexplode(transform(col(vecCol),
          x => floor(x.cast("double") * lit(LloydScale)).cast("long")))
          .as(Seq("i", "qx")))
        .groupBy("cell", "i")
        .agg(sum(col("qx")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cur.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getLong(2).toDouble / r.getLong(3) / LloydScale
      }
      cur = next
    }
    cur
  }

  /** Batch KNN join: for EVERY query row, the top-k corpus rows by cosine.
    *
    * The single-query searches above answer "one vector, one lookup"; a
    * training-data pipeline asks the batch form — "for these N probe
    * vectors, the k nearest corpus rows each" (retrieval eval, hard-negative
    * mining, cluster labeling). Shape: the query side is BROADCAST (a probe
    * batch is bounded — thousands, not billions), the corpus streams
    * through the broadcast join without shuffling data rows, and the only
    * exchange is of fixed-width (qid, id, cos) triples into the per-query
    * top-k window. Corpus size × probe count is the honest cost of exact
    * brute force; cap the probe batch, or use [[knnJoinLsh]] to prune.
    *
    * Output: (qid, vec_id, cos, rank), rank 1..k, ties broken by vec_id —
    * deterministic, so cross-engine comparable. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, qIdCol: String,
      qVecCol: String, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val scored = c.join(broadcast(q))
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.cosine(col("vec"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate batch KNN join over INTEGER-quantized LSH buckets —
    * [[knnJoinLsh]]'s semantics with [[quantizedLshBucket]]'s candidate
    * decision, so (unlike the float-projection form) the whole join is
    * bit-reproducible and fully oracle-checkable: same narrow
    * ids-only candidate shuffle, exact-cosine re-rank among candidates,
    * every bucket an integer. This is the DOCUMENTED DEFAULT batch-ANN
    * path for the same reason s06 is the default point-query path.
    *
    * The vector re-attach broadcasts the FULL `queries` frame (ids +
    * embeddings) — same probe-batch contract as [[knnJoin]]: thousands of
    * probes, not millions. Corpus vectors re-attach by a plain equi-join
    * and never broadcast. */
  def knnJoinQuantized(queries: DataFrame, corpus: DataFrame, qIdCol: String,
      qVecCol: String, idCol: String, vecCol: String, k: Int,
      bandBits: Int = 4, bandCount: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def banded(df: DataFrame, id: String, vec: String, outId: String) =
      df.select(col(id).as(outId),
        posexplode(VectorFunctions.qlshSignature(col(vec), bandBits,
          bandCount)).as(Seq("band", "bucket")))
    val qb = banded(queries, qIdCol, qVecCol, "qid")
    val cb = banded(corpus, idCol, vecCol, "vec_id")
    val candidates = qb.join(cb, Seq("band", "bucket"))
      .select(col("qid"), col("vec_id"))
      .dropDuplicates("qid", "vec_id")
      .join(broadcast(queries.select(col(qIdCol).as("qid"),
        col(qVecCol).as("qvec"))), "qid")
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cvec")),
        "vec_id")
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.cosine(col("cvec"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    candidates.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Hard-NEGATIVE mining for contrastive/embedding training: for each
    * probe, the top-k corpus items that are MOST similar yet carry a
    * DIFFERENT label — the pairs that teach a model the most (easy
    * negatives are already far; same-label neighbors are positives).
    *
    * Candidate generation is [[knnJoinQuantized]]'s integer-banded
    * equi-join (ids-only shuffle, bucket-collision-bounded fan-out); the
    * label inequality filters BEFORE the rank window, so per-query state
    * is bounded by k and candidates never rank against positives. Same
    * oracle story as s06/s08: every bucket decision is integer, so the
    * mined set mirrors exactly.
    *
    * @return (qid, q_label, vec_id, neg_label, cos, rank) */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, qIdCol: String,
      qVecCol: String, qLabelCol: String, idCol: String, vecCol: String,
      labelCol: String, k: Int, bandBits: Int = 4,
      bandCount: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def banded(df: DataFrame, id: String, vec: String, outId: String) =
      df.select(col(id).as(outId),
        posexplode(VectorFunctions.qlshSignature(col(vec), bandBits,
          bandCount)).as(Seq("band", "bucket")))
    val qb = banded(queries, qIdCol, qVecCol, "qid")
    val cb = banded(corpus, idCol, vecCol, "vec_id")
    val candidates = qb.join(cb, Seq("band", "bucket"))
      .select(col("qid"), col("vec_id"))
      .dropDuplicates("qid", "vec_id")
      .join(broadcast(queries.select(col(qIdCol).as("qid"),
        col(qVecCol).as("qvec"), col(qLabelCol).as("q_label"))), "qid")
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cvec"),
        col(labelCol).as("neg_label")), "vec_id")
      .filter(col("q_label") =!= col("neg_label"))
      .select(col("qid"), col("q_label"), col("vec_id"), col("neg_label"),
        round(VectorFunctions.cosine(col("cvec"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    candidates.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Approximate batch KNN join: candidates are (query, corpus) pairs
    * sharing at least one sign-random-projection band bucket — an ordinary
    * equi-join on (band, bucket) instead of a cross product — then exact
    * cosine + per-query top-k among candidates only.
    *
    * This is the shape that survives scale on BOTH sides: corpus and query
    * band keys shuffle as fixed-width longs, the join fan-out is bucket-
    * collision-bounded, and no row ever meets more than its bucket mates.
    * Recall tunes with (bandBits ↓, bandCount ↑) exactly as [[lshTopK]].
    * Query vectors re-attach via the same bounded-probe-batch broadcast
    * as [[knnJoinQuantized]]. */
  def knnJoinLsh(queries: DataFrame, corpus: DataFrame, qIdCol: String,
      qVecCol: String, idCol: String, vecCol: String, k: Int,
      bandBits: Int = 8, bandCount: Int = 8, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def banded(df: DataFrame, id: String, vec: String, outId: String) =
      df.select(col(id).as(outId), col(vec).as(s"${outId}_vec"),
        posexplode(array((0 until bandCount).map(b =>
          VectorFunctions.embLshBucket(col(vec), bandBits, seed + b)): _*))
          .as(Seq("band", "bucket")))
    // candidate generation stays NARROW (ids only) and vectors re-attach
    // after the pair dedup — same rationale as Dedup.minhashLshPairs: the
    // dedup shuffle carries fixed-width ids, never embedding arrays
    val qb = banded(queries, qIdCol, qVecCol, "qid").drop("qid_vec")
    val cb = banded(corpus, idCol, vecCol, "vec_id").drop("vec_id_vec")
    val candidates = qb.join(cb, Seq("band", "bucket"))
      .select(col("qid"), col("vec_id"))
      .dropDuplicates("qid", "vec_id")
      .join(broadcast(queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qvec"))), "qid")
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cvec")), "vec_id")
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.cosine(col("cvec"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Accuracy-contract harness for the float-projection ANN variants
    * (the q19/q41 sketch-gate pattern applied to approximate search):
    * returns the EXACT ground-truth rows — fully SQL-mirrorable — with one
    * appended boolean column asserting the approximate operator recalled
    * at least `minHits` of the ground-truth keys. The approximate query
    * runs in-engine to produce the flag, so an operator crash or a recall
    * collapse turns the gate red, while the row surface stays bit-exact
    * against the brute-force mirror (the oracle emits the same rows with
    * the contract as a constant TRUE).
    *
    * Both inputs are top-k results (≤ tens of rows); the hit count is a
    * left-semi join + global count on those tiny frames, broadcast back
    * onto the ground truth — no data-scale work beyond the two operators
    * themselves. */
  /** Exact top-k by INNER PRODUCT vs a constant query vector — MIPS
    * (maximum inner product search), the retrieval objective when vector
    * magnitudes carry signal (e.g. popularity-scaled item embeddings),
    * where cosine's normalization would erase it. Same sequential-fold
    * arithmetic as [[bruteForceTopK]] minus the norms, so the s12 oracle
    * mirrors every digit. */
  def mipsTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol).as("vec_id"),
      round(VectorFunctions.dot(col(vecCol), vecLit(query)), 6).as("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(k)

  /** Approximate MIPS by the norm-augmentation reduction (Bachrach et
    * al. 2014; Shrivastava & Li 2014): append one coordinate
    * sqrt(M² − ‖v‖²) to every corpus vector (M = max corpus norm) and 0
    * to the query — all augmented corpus vectors then share norm M, so
    * cos(q⁺, v⁺) = ⟨q,v⟩ / (‖q‖·M) is MONOTONE in the inner product and
    * the integer-exact sign-LSH banding of [[quantizedLshTopK]] applies
    * unchanged. Candidates are ranked by the exact inner product.
    *
    * Scale shape: M is ONE partial-agg scalar (the only driver value);
    * banding/bucketing then behaves exactly like the cosine ANN path —
    * fixed-width candidate shuffles, no all-pairs anywhere.
    *
    * Repeated queries over the SAME corpus should not re-pay the M²
    * pre-pass: compute it once with [[corpusMaxNorm2]] and pass it as
    * `maxNorm2` — the augmentation bound only has to be ≥ every corpus
    * ‖v‖², so a cached value stays valid until rows are ADDED with larger
    * norms (deletes/filters never invalidate it). With `maxNorm2` given
    * this builds a pure lazy plan: zero jobs, zero corpus scans until the
    * result is consumed. */
  def mipsTopKQuantized(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, bandBits: Int = 4,
      bandCount: Int = 8, maxNorm2: Option[Double] = None): DataFrame = {
    val m2 = maxNorm2.getOrElse(corpusMaxNorm2(df, vecCol))
    // the augmented tail coordinate sqrt(M² − ‖v‖²) is computed ONCE per
    // row (codegen'd dot) and appended inside the single-pass any-match
    // kernel — r13's form rebuilt the augmented array and re-ran the
    // interpreted quantization once per band per row (the 35 s s12 plan)
    val tail = sqrt(greatest(
      lit(m2) - VectorFunctions.dot(col(vecCol), col(vecCol)), lit(0.0)))
    val qb = quantizedBuckets(query :+ 0.0, bandBits, bandCount)
    df.filter(VectorFunctions.qlshAnyMatchAug(col(vecCol), tail, qb, bandBits))
      .select(col(idCol).as("vec_id"),
        round(VectorFunctions.dot(col(vecCol), vecLit(query)), 6).as("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(k)
  }

  /** The MIPS augmentation bound M² = max corpus ‖v‖², as one partial-agg
    * scan. Callers serving many queries against one corpus compute this
    * once and thread it through [[mipsTopKQuantized]]'s `maxNorm2` so the
    * stats pre-pass is paid once, not per query. */
  def corpusMaxNorm2(df: DataFrame, vecCol: String): Double =
    df.agg(max(VectorFunctions.dot(col(vecCol), col(vecCol))))
      .collect()(0).getDouble(0)

  def withRecallContract(exact: DataFrame, approx: DataFrame,
      keyCols: Seq[String], minHits: Int, flagCol: String): DataFrame = {
    // the ground-truth subtree (a full exact scan) feeds BOTH the flag's
    // semi-join and the output surface; materialize its <= top-k rows once
    // so the gate pays the exact computation once, not twice
    val exactM = exact.localCheckpoint()
    val keys = keyCols.map(col)
    val flag = exactM.select(keys: _*)
      .join(approx.select(keys: _*), keyCols, "left_semi")
      .agg(count(lit(1)).as("__nhit"))
      .select((col("__nhit") >= minHits).as(flagCol))
    exactM.crossJoin(broadcast(flag))
  }

  /** Fetch one embedding as the query vector (driver-side, k rows ≪ data). */
  def vectorOf(spark: SparkSession, dir: String, vecId: Long): Array[Double] = {
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === vecId)
      .select(col("embedding"))
      .collect().head.getSeq[Float](0).map(_.toDouble).toArray
  }

  // --------------------------------------------------- product quantization
  // PQ (Jégou et al. 2011) is the memory-bound ANN path for a 100 TB
  // embedding corpus: each vector compresses to m sub-codes (here 8 codes
  // of 4 bits = one INT per vector, a 64× reduction over fp32×64), and a
  // query ranks the whole corpus through an m×ksub lookup table without
  // touching the raw floats. The variant here is INTEGER-EXACT end to
  // end — components quantize to floor(x·128) (the s06 scale), codebooks
  // are fixed-point sub-vectors of a deterministic md5-ordered corpus
  // sample, and assignment/ADC are integer squared-L2 — so unlike
  // classical float k-means PQ, the full result SET mirrors in SQL.

  /** Deterministic PQ codebook: the `ksub` corpus rows with the smallest
    * (md5(id), id) key — a uniform, engine-reproducible sample — sliced
    * into `m` fixed-point sub-vectors each. Returns cb(mi)(c) =
    * sub-vector of centroid c in subspace mi. Driver collect is bounded
    * at `ksub` rows. */
  def pqCodebook(df: DataFrame, idCol: String,
      vecCol: String, m: Int, ksub: Int): Array[Array[Array[Long]]] = {
    val seeds = df
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .orderBy(md5(col("cid").cast("string").cast("binary")), col("cid"))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Any](1).map {
        case f: java.lang.Float => math.floor(f.toDouble * QlshScale).toLong
        case d: java.lang.Double => math.floor(d.doubleValue() * QlshScale).toLong
        case other => throw new IllegalArgumentException(
          s"$vecCol must be an array<float|double>, found element: " +
            (if (other == null) "null" else other.getClass.getName))
      }.toArray)
    require(seeds.length >= ksub,
      s"PQ codebook needs at least ksub=$ksub corpus rows, found ${seeds.length}")
    require(seeds.head.length % m == 0,
      s"vector dim ${seeds.head.length} must be divisible by m=$m subspaces")
    val dsub = seeds.head.length / m
    Array.tabulate(m, ksub)((mi, c) => seeds(c).slice(mi * dsub, (mi + 1) * dsub))
  }

  /** PQ ANN top-k: encode every corpus vector row-locally against the
    * broadcast codebook (argmin integer squared-L2 per subspace, lowest
    * centroid id on ties), rank by the ADC approximation — the sum of
    * driver-precomputed query-to-centroid distances indexed by the row's
    * codes — and carry the exact cosine for inspection. The scan is
    * map-only (codebook and lookup tables ride in as literals; no
    * shuffle, top-k is TakeOrderedAndProject); at scale the m 4-bit
    * codes persist as one INT column and the raw vectors never re-read.
    *
    * @return (vec_id, code BIGINT — m 4-bit fields, approx_dist BIGINT,
    *         cos) ordered by (approx_dist ASC, vec_id ASC) */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, m: Int = 8,
      ksub: Int = 16): DataFrame = {
    val cb = pqCodebook(df, idCol, vecCol, m, ksub)
    pqRank(df, idCol, vecCol, cb, query, k)
  }

  /** PQ encode + ADC ranking against a PREBUILT codebook — the shared
    * kernel behind [[pqTopK]] (codebook trained on the ranked frame
    * itself) and [[ivfPqTopK]] (codebook trained on the FULL corpus at
    * index-build time, ranking only the probed cells' rows, so codes
    * are identical no matter which cells a given query probes). */
  private def pqRank(df: DataFrame, idCol: String, vecCol: String,
      cb: Array[Array[Array[Long]]], query: Array[Double],
      k: Int): DataFrame = {
    val m = cb.length
    val ksub = cb(0).length
    require(ksub <= 16, "code packs 4 bits per subspace")
    require(query.length % m == 0,
      s"query dim ${query.length} must be divisible by m=$m subspaces " +
        "(trailing dimensions would silently drop from every distance)")
    val dsub = query.length / m
    val qq = query.map(x => math.floor(x * QlshScale).toLong)
    // ADC lookup table: distance from the query's sub-vector to every
    // centroid, all integer
    val qdist: Array[Array[Long]] = Array.tabulate(m, ksub) { (mi, c) =>
      var s = 0L; var j = 0
      while (j < dsub) {
        val d = qq(mi * dsub + j) - cb(mi)(c)(j); s += d * d; j += 1
      }
      s
    }
    val perSub = (0 until m).map { mi =>
      val dists = subspaceDists(cb, mi, dsub)
      val code = (array_position(dists, array_min(dists)) - 1L).as(s"__c$mi")
      code
    }
    val withCodes = df
      .select(col(idCol).as("vec_id"), col(vecCol).as("__vec"))
      .withColumn("__qv", transform(col("__vec"),
        x => floor(x.cast("double") * lit(QlshScale)).cast("long")))
      .select(col("vec_id") +: col("__vec") +: perSub: _*)
    withCodes
      .withColumn("code",
        (0 until m).map(mi => shiftleft(col(s"__c$mi"), 4 * mi))
          .reduce(_ + _).cast("long"))
      .withColumn("approx_dist",
        (0 until m).map(mi => element_at(typedLit(qdist(mi).toSeq),
          (col(s"__c$mi") + 1L).cast("int")))
          .reduce(_ + _).cast("long"))
      .withColumn("cos",
        round(VectorFunctions.cosine(col("__vec"), vecLit(query)), 6))
      .select(col("vec_id"), col("code"), col("approx_dist"), col("cos"))
      .orderBy(col("approx_dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** The fixed-point squared-L2 distances from a row's `__qv` sub-vector
    * to every centroid of subspace `mi` — the assignment kernel SHARED
    * by [[pqRank]] (argmin → code) and [[pqDistortion]] (min → error),
    * so encode and audit can never drift apart. */
  private def subspaceDists(cb: Array[Array[Array[Long]]], mi: Int,
      dsub: Int): Column = {
    val ksub = cb(mi).length
    val sub = slice(col("__qv"), mi * dsub + 1, dsub)
    array((0 until ksub).map { c =>
      aggregate(
        zip_with(sub, typedLit(cb(mi)(c).toSeq),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    }: _*)
  }

  /** PQ DISTORTION AUDIT — the quantization-error census that decides
    * whether a codebook (m, ksub) is good enough before 100 TB of raw
    * floats are thrown away: per subspace, the count / sum / max /
    * integral mean of each vector's fixed-point squared-L2 distance to
    * its ASSIGNED centroid (the same min the encoder takes, via the
    * shared [[subspaceDists]] kernel). A subspace whose mean distortion
    * is an outlier is under-coded — the standard signal to re-slice or
    * raise ksub. Map-only scan + an m-row partial agg; all integer, so
    * the full audit mirrors in SQL. */
  def pqDistortion(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16): DataFrame = {
    val cb = pqCodebook(df, idCol, vecCol, m, ksub)
    val dsub = cb(0)(0).length
    val perSub = (0 until m).map { mi =>
      array_min(subspaceDists(cb, mi, dsub)).as(s"__d$mi")
    }
    val stacked = (0 until m).map(mi => s"${mi}L, __d$mi").mkString(", ")
    df.select(col(vecCol).as("__vec"))
      .withColumn("__qv", transform(col("__vec"),
        x => floor(x.cast("double") * lit(QlshScale)).cast("long")))
      .select(perSub: _*)
      .select(expr(s"stack($m, $stacked) as (subspace, dist)"))
      .groupBy("subspace")
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("dist")).as("sum_dist"),
        max(col("dist")).as("max_dist"))
      .select(col("subspace"), col("n_vectors"), col("sum_dist"),
        col("max_dist"),
        expr("cast((cast(sum_dist as decimal(38,0)) * 1000000)" +
          " div n_vectors as bigint)").as("mean_dist_micro"))
      .orderBy("subspace")
  }

  /** IVF-PQ ANN top-k — the two-level layout an actual 100 TB vector
    * store runs (FAISS `IVFx,PQy` with by-residual off): a coarse
    * quantizer ([[ivfCentroids]] — deterministic seeds + Lloyd
    * refinement) partitions the corpus into `nlist` cells, and every
    * vector compresses to m 4-bit PQ codes against ONE corpus-trained
    * codebook ([[pqCodebook]]). A query probes only the `nprobe` cells
    * whose centroids are nearest (driver-side: nlist is tiny) and ranks
    * the survivors by the integer ADC table — so at scale the store is
    * (cell, code) pairs partitioned by cell, a probe is partition
    * pruning + a map-only code scan, and the raw floats are never
    * re-read after index build. The PQ codebook is trained on the full
    * corpus, NOT per cell, so codes are a build-time artifact identical
    * across queries.
    *
    * The code ranking is followed by a REFINE pass (FAISS's
    * `IndexRefineFlat` discipline): the `refine`·k best rows by ADC
    * re-rank by exact cosine and only the top k survive. A 16-entry
    * sub-codebook is deliberately coarse — its job is cheap candidate
    * pruning, not final ordering — and at scale the refine step touches
    * exactly refine·k raw vectors per query, so the raw floats stay a
    * point-lookup store, never a scan.
    *
    * Both levels are integer-exact (fixed-point Lloyd means, integer
    * sub-distances), so results are bit-deterministic; recall against
    * exact brute force is probabilistic like every IVF scheme — gate it
    * with [[withRecallContract]].
    *
    * @return (vec_id, code, approx_dist, cos) ordered by
    *         (cos DESC, vec_id ASC), at most k rows */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, refine: Int = 4, lloydIters: Int = 2,
      trainFactor: Int = 64): DataFrame =
    ivfPqTopKWith(df, idCol, vecCol,
      ivfCentroids(df, idCol, vecCol, nlist, lloydIters, trainFactor),
      pqCodebook(df, idCol, vecCol, m, ksub),
      query, k, nprobe, refine)

  /** [[ivfPqTopK]] against PREBUILT index artifacts — the index-reuse
    * entry point matching [[ivfTopKWith]]: a repeated-query workload over
    * a static corpus trains the coarse quantizer and the PQ codebook
    * ONCE (both are build-time artifacts of the index, identical across
    * queries by construction) and probes many times, instead of paying
    * the seed-collect + Lloyd + codebook training scans per call. */
  def ivfPqTopKWith(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Double])],
      codebook: Array[Array[Array[Long]]], query: Array[Double],
      k: Int, nprobe: Int, refine: Int): DataFrame = {
    // same invariant as ivfTopKWith: probeCells speaks tuple ids,
    // nearestCentroid speaks array positions — reordered/filtered
    // centroids would silently probe the wrong cells
    require(centroids.zipWithIndex.forall { case ((id, _), i) => id == i },
      "ivfPqTopKWith requires centroids(i) = (i, vec) — ids must equal " +
        "array positions, as produced by ivfCentroids; do not reorder " +
        "or filter")
    val cells = probeCells(centroids, query, nprobe)
    val probed = df
      .withColumn("__cell",
        VectorFunctions.nearestCentroid(col(vecCol), centroids.map(_._2)))
      .filter(col("__cell").isin(cells.toSeq: _*))
      .drop("__cell")
    pqRank(probed, idCol, vecCol, codebook, query, k * refine)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** (vec_id, band, bucket) rows over the integer-exact sign-LSH bands —
    * the persistable ANN bucket INDEX (what a production vector store
    * writes partitioned by (band, bucket) and probes by equi-join). */
  def quantizedBandIndex(df: DataFrame, idCol: String, vecCol: String,
      bandBits: Int = 4, bandCount: Int = 8): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"),
      posexplode(VectorFunctions.qlshSignature(col(vecCol), bandBits,
        bandCount)).as(Seq("band", "bucket")))

  /** INCREMENTAL KNN against a persisted bucket index — the d19/d20
    * daily-ingest discipline applied to vectors: history vectors are
    * never re-bucketed (the caller passes the stored
    * [[quantizedBandIndex]] rows), the new batch buckets itself, probes
    * the store by (band, bucket) equi-join plus an in-batch self-probe,
    * and each new vector ranks its candidates by exact cosine. New
    * batches never re-rank old vectors — exactly how a production ANN
    * index absorbs appends.
    *
    * Scale shape: both candidate joins ship (id, band, bucket) — never
    * vectors; vectors re-attach to surviving candidate PAIRS by plain
    * equi-join. `bucketCap` bounds each (band, bucket) resident list at
    * the cap lowest ids (the StreamingDedup/d20 skew guard), so a hot
    * bucket fans out O(cap·probes), never members². The per-query rank
    * window partitions by qid over candidate counts bounded by
    * bandCount·cap.
    *
    * @return (qid, rank, nid, cos) — top-`k` neighbors per batch vector
    *         among history ∪ batch, (cos DESC, nid ASC) order. */
  def incrementalKnn(storeIndex: DataFrame, store: DataFrame,
      batch: DataFrame, idCol: String, vecCol: String, k: Int,
      bandBits: Int = 4, bandCount: Int = 8,
      bucketCap: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bIdx = quantizedBandIndex(batch, idCol, vecCol, bandBits, bandCount)
    def capRes(idx: DataFrame) = idx
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("bucket"))
          .orderBy(col("vec_id"))))
      .filter(col("rn") <= bucketCap).drop("rn")
    val probe = bIdx.select(col("vec_id").as("qid"), col("band"),
      col("bucket"))
    val histC = probe
      .join(capRes(storeIndex).select(col("vec_id").as("nid"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .select("qid", "nid").dropDuplicates("qid", "nid")
    val batchC = probe
      .join(capRes(bIdx).select(col("vec_id").as("nid"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").dropDuplicates("qid", "nid")
    val qv = batch.select(col(idCol).cast("long").as("qid"),
      col(vecCol).as("__q"))
    val nv = store.select(col(idCol).cast("long").as("nid"),
      col(vecCol).as("__n"))
      .unionAll(batch.select(col(idCol).cast("long").as("nid"),
        col(vecCol).as("__n")))
    histC.unionAll(batchC)
      .join(qv, "qid").join(nv, "nid")
      .select(col("qid"), col("nid"),
        round(VectorFunctions.cosine(col("__q"), col("__n")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
