package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** ANN similarity-search queries over `embeddings`. */
object SimilarityQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  // ---------------------------------------------------------------- s01
  /** Exact brute-force cosine top-10 for the vector of vec_id=0.
    * Oracle mirrors the sequential fold with explicit double casts. */
  def s01BruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    Similarity.bruteForceTopK(emb(spark, dir), "vec_id", "embedding", q, 10)
  }

  val s01Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  ROUND(
      |    LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |    6) AS cos
      |FROM embeddings, q
      |ORDER BY cos DESC, vec_id ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s02
  /** Float-projection LSH ANN under the ACCURACY-CONTRACT gate shape (the
    * q19/q41 sketch pattern): the row surface is the exact brute-force
    * top-10 — fully mirrored by the s01 double-fold SQL — and the LSH
    * operator runs in-engine to produce `lsh_recall_ok`, pinned TRUE by
    * the oracle. The float variant's RESULT SET hinges on IEEE-summation
    * bucket boundaries (see COVERAGE.md), so the set itself can't mirror;
    * what IS semantics — exact ranking arithmetic plus the recall contract
    * — is what the oracle checks. Bound: ≥ 4 of 10 on this corpus's
    * near-uniform random vectors (measured 5–8/10 across sf0.001–0.1;
    * chance is E[hits] = k²/n ≈ 0.2, so 4 is ~20× above chance; the
    * operator's high-similarity regime is pinned at recall ≥ 0.8 on
    * clustered data in LlmOpsSpec). */
  def s02LshTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    Similarity.withRecallContract(
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10),
      Similarity.lshTopK(e, "vec_id", "embedding", q, 10,
        bandBits = 6, bandCount = 12, seed = 42L),
      Seq("vec_id"), minHits = 4, flagCol = "lsh_recall_ok")
      .orderBy(org.apache.spark.sql.functions.col("cos").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
  }

  val s02Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |gt AS (
      |  SELECT vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM embeddings, q
      |  ORDER BY cos DESC, vec_id ASC
      |  LIMIT 10)
      |SELECT vec_id, cos, TRUE AS lsh_recall_ok FROM gt
      |ORDER BY cos DESC, vec_id ASC""".stripMargin

  // ---------------------------------------------------------------- s03
  /** IVF ANN under the same accuracy-contract shape as s02: exact
    * brute-force top-10 rows (s01 mirror) + `ivf_recall_ok` from running
    * the deterministic-centroid nprobe search in-engine. Bound ≥ 4 of 10
    * (measured 5–8/10 across SFs on this corpus; Lloyd-refined recall
    * ≥ 0.9 on clustered data is pinned in LlmOpsSpec). */
  def s03IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    Similarity.withRecallContract(
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10),
      Similarity.ivfTopK(e, "vec_id", "embedding", q, 10,
        nlist = 16, nprobe = 4),
      Seq("vec_id"), minHits = 4, flagCol = "ivf_recall_ok")
      .orderBy(org.apache.spark.sql.functions.col("cos").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
  }

  val s03Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |gt AS (
      |  SELECT vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM embeddings, q
      |  ORDER BY cos DESC, vec_id ASC
      |  LIMIT 10)
      |SELECT vec_id, cos, TRUE AS ivf_recall_ok FROM gt
      |ORDER BY cos DESC, vec_id ASC""".stripMargin

  // ---------------------------------------------------------------- s04
  /** Batch KNN join: top-5 corpus neighbors for EACH of the 5 probe
    * vectors (vec_id 0..4) in one pass — query side broadcast, per-query
    * rank window. Exact, so fully oracled: DuckDB mirrors the cross
    * product, sequential-fold cosine, and (cos DESC, vec_id ASC) rank. */
  def s04KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = emb(spark, dir)
    Similarity.knnJoin(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
      "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  val s04Sql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |           WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.qid, e.vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM embeddings e, q),
      |ranked AS (
      |  SELECT qid, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT qid, vec_id, cos, rank FROM ranked
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s05
  /** Approximate batch KNN join (float band-bucket equi-join candidates)
    * under the accuracy-contract shape: the row surface is the EXACT
    * knn join (the s04 mirror — 5 probes × top-5 each), and
    * [[Similarity.knnJoinLsh]] runs in-engine to produce
    * `lsh_recall_ok` — ≥ 10 of the 25 exact (qid, vec_id) pairs recovered
    * (measured 11–18/25 across sf0.001–0.1 on this near-uniform corpus;
    * chance is E[hits] = 5·k²/n ≈ 1.25 pairs, and LlmOpsSpec pins
    * recall ≥ 0.8 on clustered data). */
  def s05KnnJoinLsh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = emb(spark, dir)
    val probes = e.filter(col("vec_id") < 5)
    Similarity.withRecallContract(
      Similarity.knnJoin(probes, e, "vec_id", "embedding",
        "vec_id", "embedding", k = 5),
      Similarity.knnJoinLsh(probes, e, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, bandBits = 6, bandCount = 12,
        seed = 42L),
      Seq("qid", "vec_id"), minHits = 10, flagCol = "lsh_recall_ok")
      .orderBy(col("qid"), col("rank"))
  }

  val s05Sql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |           WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.qid, e.vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM embeddings e, q),
      |ranked AS (
      |  SELECT qid, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT qid, vec_id, cos, rank, TRUE AS lsh_recall_ok FROM ranked
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s06
  /** Integer-quantized LSH ANN top-10 — the MIRRORABLE approximate
    * variant: components quantize to floor(x·128), projections are
    * integer dot products with LCG coefficients, buckets are sign bits.
    * No float summation order anywhere in the candidate decision, so
    * unlike s02/s03 this approximate query has a FULL DuckDB oracle
    * (the cosine ranking reuses the s01 double-fold mirror). */
  def s06QuantizedLsh(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    Similarity.quantizedLshTopK(emb(spark, dir), "vec_id", "embedding", q, 10,
      bandBits = 4, bandCount = 8)
  }

  /** Mirror of [[Similarity.quantizedLshBucket]]: same LCG constants
    * (×2654435761 + 40503 mod 8191, centered), same flat (band, bit, dim)
    * coefficient index, same floor(x·128) quantization — all BIGINT. */
  val s06Sql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |    LIST_TRANSFORM(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 128) AS BIGINT)) AS q
      |  FROM embeddings),
      |bk AS (
      |  SELECT vec_id, band,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, 4), bit ->
      |      CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q) + 1), i ->
      |          q[i] * ((((band * 4 + bit) * LEN(q) + (i - 1)) * 2654435761
      |                   + 40503) % 8191 - 4095)))
      |        >= 0 THEN 1 << bit ELSE 0 END)) AS bucket
      |  FROM qv CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS band)),
      |cand AS (
      |  SELECT DISTINCT c.vec_id
      |  FROM bk c JOIN (SELECT band, bucket FROM bk WHERE vec_id = 0) qb
      |    ON c.band = qb.band AND c.bucket = qb.bucket),
      |q0 AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  ROUND(
      |    LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |    6) AS cos
      |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q0
      |ORDER BY cos DESC, e.vec_id ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s07
  /** Int8 embedding quantization audit: per-vector symmetric scale
    * (127/max|x|), floor(x·scale + 0.5) rounding, exact integer moments of
    * the quantized vector plus double-fold reconstruction MSE. The
    * storage-path complement of the search gates: 4× smaller vectors with
    * a verified error budget. Fully mirrorable (no half-even rounding, no
    * float summation in the integer outputs). */
  def s07QuantizeAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.operators.Embeddings.quantizationStats(emb(spark, dir),
      "vec_id", "embedding").orderBy(col("vec_id"))
  }

  val s07Sql: String =
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    LIST_MAX(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) AS am
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, embedding,
      |    CASE WHEN am > 0 THEN 127.0 / am ELSE 1.0 END AS scale
      |  FROM s),
      |q AS (
      |  SELECT vec_id, embedding, scale,
      |    LIST_TRANSFORM(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS qv
      |  FROM sc)
      |SELECT vec_id,
      |  ROUND(scale, 6) AS qscale,
      |  LIST_SUM(qv)::BIGINT AS qsum,
      |  LIST_SUM(LIST_TRANSFORM(qv, v -> v * v))::BIGINT AS qnorm,
      |  ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(qv) + 1), i ->
      |      (CAST(embedding[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE) / scale)
      |      * (CAST(embedding[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE) / scale)))
      |    / CAST(LEN(qv) AS DOUBLE), 6) AS mse
      |FROM q ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- s08
  /** Quantized batch KNN join — s05's banded-candidate semantics with
    * s06's integer bucket decision, so the whole approximate JOIN carries
    * a full oracle (the float variant is verifiable only by recall spec).
    * Five query vectors against the corpus, top-5 each among candidates
    * sharing ≥ 1 of 8 four-bit band buckets. */
  def s08KnnJoinQuantized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = emb(spark, dir)
    Similarity.knnJoinQuantized(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, bandBits = 4, bandCount = 8)
      .orderBy(col("qid"), col("rank"))
  }

  /** Candidate decision mirrored from [[Similarity.quantizedLshBucket]]
    * (the s06 constants), re-rank mirrored from the s04 cosine fold. */
  val s08Sql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |    LIST_TRANSFORM(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 128) AS BIGINT)) AS q
      |  FROM embeddings),
      |bk AS (
      |  SELECT vec_id, band,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, 4), bit ->
      |      CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q) + 1), i ->
      |          q[i] * ((((band * 4 + bit) * LEN(q) + (i - 1)) * 2654435761
      |                   + 40503) % 8191 - 4095)))
      |        >= 0 THEN 1 << bit ELSE 0 END)) AS bucket
      |  FROM qv CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS band)),
      |cand AS (
      |  SELECT DISTINCT qb.vec_id AS qid, cb.vec_id
      |  FROM bk qb JOIN bk cb ON cb.band = qb.band AND cb.bucket = qb.bucket
      |  WHERE qb.vec_id < 5),
      |scored AS (
      |  SELECT c.qid, c.vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN embeddings q ON q.vec_id = c.qid),
      |ranked AS (
      |  SELECT qid, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT qid, vec_id, cos, rank FROM ranked
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s09
  /** Product-quantization ANN ([[Similarity.pqTopK]]): every vector
    * compresses to 8 four-bit codes against a deterministic fixed-point
    * codebook and the whole corpus ranks through a 8×16 integer lookup
    * table — the memory-bound ANN layout for a 100 TB embedding store
    * (one INT per vector at query time, raw floats never re-read).
    * Integer codebooks + integer squared-L2 make the exact result set
    * mirrorable, codes included. */
  def s09PqTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    Similarity.pqTopK(emb(spark, dir), "vec_id", "embedding", q, 10)
  }

  /** Shared DuckDB mirror of the PQ train/encode chain — ends in
    * `codes(vec_id, m, c, d)` where `c` is the assigned sub-code and
    * `d` ITS fixed-point squared-L2 distance (= the subspace's
    * quantization distortion), plus the full `enc` distance table. Both
    * the ANN gate (s09) and the distortion audit (s24) replay the
    * identical codebook + assignment. */
  private val pqCodesCte: String =
    """qv AS (
      |  SELECT vec_id,
      |    LIST_TRANSFORM(embedding, x -> FLOOR(CAST(x AS DOUBLE) * 128)::BIGINT) AS v
      |  FROM embeddings),
      |seeds AS (
      |  SELECT v, ROW_NUMBER() OVER (ORDER BY MD5(vec_id::VARCHAR), vec_id) - 1 AS c
      |  FROM qv
      |  QUALIFY c < 16),
      |cbm AS (
      |  SELECT s.c, mm.m, s.v[mm.m*8+1 : mm.m*8+8] AS sub
      |  FROM seeds s, (SELECT UNNEST(RANGE(0, 8)) AS m) mm),
      |enc AS (
      |  SELECT q.vec_id, cb.m, cb.c,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
      |      i -> (q.v[cb.m*8+i] - cb.sub[i]) * (q.v[cb.m*8+i] - cb.sub[i])))::BIGINT AS d
      |  FROM qv q CROSS JOIN cbm cb),
      |codes AS (
      |  SELECT vec_id, m, c, d
      |  FROM enc
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) = 1)""".stripMargin

  val s09Sql: String =
    s"""WITH $pqCodesCte,
      |qd AS (SELECT m, c, d FROM enc WHERE vec_id = 0),
      |packed AS (
      |  SELECT k.vec_id,
      |    SUM(k.c::BIGINT << (4 * k.m))::BIGINT AS code,
      |    SUM(qd.d)::BIGINT AS approx_dist
      |  FROM codes k JOIN qd ON qd.m = k.m AND qd.c = k.c
      |  GROUP BY 1),
      |q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT p.vec_id, p.code, p.approx_dist,
      |  ROUND(
      |    LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |    6) AS cos
      |FROM packed p JOIN embeddings e USING (vec_id) CROSS JOIN q0
      |ORDER BY approx_dist ASC, vec_id ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s24
  /** PQ distortion audit ([[Similarity.pqDistortion]]): per subspace,
    * count / sum / max / integral mean of every vector's distance to its
    * assigned centroid — the decide-before-you-delete-the-floats
    * quantization-quality census. The oracle replays the FULL codebook
    * train + assignment through the s09-shared CTE, so encoder and
    * audit are pinned to the same arithmetic. */
  def s24PqDistortion(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqDistortion(emb(spark, dir), "vec_id", "embedding")

  val s24Sql: String =
    s"""WITH $pqCodesCte
      |SELECT m::BIGINT AS subspace, COUNT(*)::BIGINT AS n_vectors,
      |  SUM(d)::BIGINT AS sum_dist, MAX(d)::BIGINT AS max_dist,
      |  CAST(SUM(d)::HUGEINT * 1000000 // COUNT(*) AS BIGINT)
      |    AS mean_dist_micro
      |FROM codes GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- s10
  /** Contrastive hard-negative mining ([[Similarity.hardNegatives]]):
    * per probe (vec_id < 5), the 5 most-similar corpus vectors with a
    * DIFFERENT label — integer-banded candidates, exact-cosine rank,
    * label filter before the window. Fully mirrored like s08, plus the
    * label inequality. */
  def s10HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = emb(spark, dir)
    Similarity.hardNegatives(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding", "label",
      "vec_id", "embedding", "label", k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  val s10Sql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |    LIST_TRANSFORM(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 128) AS BIGINT)) AS q
      |  FROM embeddings),
      |bk AS (
      |  SELECT vec_id, band,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, 4), bit ->
      |      CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q) + 1), i ->
      |          q[i] * ((((band * 4 + bit) * LEN(q) + (i - 1)) * 2654435761
      |                   + 40503) % 8191 - 4095)))
      |        >= 0 THEN 1 << bit ELSE 0 END)) AS bucket
      |  FROM qv CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS band)),
      |cand AS (
      |  SELECT DISTINCT qb.vec_id AS qid, cb.vec_id
      |  FROM bk qb JOIN bk cb ON cb.band = qb.band AND cb.bucket = qb.bucket
      |  WHERE qb.vec_id < 5),
      |scored AS (
      |  SELECT c.qid, q.label AS q_label, c.vec_id, e.label AS neg_label,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN embeddings q ON q.vec_id = c.qid
      |  WHERE q.label <> e.label),
      |ranked AS (
      |  SELECT qid, q_label, vec_id, neg_label, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT qid, q_label, vec_id, neg_label, cos, rank FROM ranked
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s11
  /** Per-dimension embedding DISTRIBUTION DRIFT
    * ([[graft.operators.Embeddings.driftStats]]) between two corpus
    * slices (labels 0–4 vs 5–9, standing in for old-encoder vs
    * new-encoder or day-over-day shards): exact fixed-point counts /
    * sums / sums-of-squares per dimension, and an integer
    * cross-multiplied mean-shift verdict (|Δmean| > 0.005) — the
    * monitor that catches a drifted encoder before an index rebuild.
    * Dim-bounded summary state; verdicts mirror exactly (the oracle
    * RECOMPUTES the drift booleans, they are not constants). */
  def s11EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = emb(spark, dir)
    graft.operators.Embeddings.driftStats(
      e.filter(col("label") < 5), e.filter(col("label") >= 5), "embedding")
  }

  val s11Sql: String =
    """WITH ex AS (
      |  SELECT label,
      |    UNNEST(RANGE(0, LEN(embedding))) AS dim,
      |    UNNEST(LIST_TRANSFORM(embedding,
      |      x -> FLOOR(CAST(x AS DOUBLE) * 4096)::BIGINT)) AS q
      |  FROM embeddings),
      |a AS (SELECT dim, COUNT(*) AS n_a, SUM(q) AS sum_a,
      |        SUM(q * q) AS ssq_a
      |      FROM ex WHERE label < 5 GROUP BY 1),
      |b AS (SELECT dim, COUNT(*) AS n_b, SUM(q) AS sum_b,
      |        SUM(q * q) AS ssq_b
      |      FROM ex WHERE label >= 5 GROUP BY 1)
      |SELECT a.dim::INT AS dim,
      |  n_a::BIGINT AS n_a, sum_a::BIGINT AS sum_a, ssq_a::BIGINT AS ssq_a,
      |  n_b::BIGINT AS n_b, sum_b::BIGINT AS sum_b, ssq_b::BIGINT AS ssq_b,
      |  (ABS(sum_a::HUGEINT * n_b - sum_b::HUGEINT * n_a) * 200
      |     > n_a::HUGEINT * n_b * 4096) AS drift
      |FROM a JOIN b USING (dim)
      |ORDER BY dim""".stripMargin

  // ---------------------------------------------------------------- s12
  /** MIPS (maximum inner product search) under the s02 accuracy-contract
    * shape: the row surface is the exact inner-product top-10 — the s01
    * double-fold mirror minus the norm divisions — and
    * [[Similarity.mipsTopKQuantized]] runs the norm-augmentation
    * reduction (append sqrt(M²−‖v‖²); MIPS becomes cosine) through the
    * integer-exact sign-LSH banding in-engine to produce
    * `mips_recall_ok`, pinned TRUE. Bound ≥ 4 of 10 on this corpus
    * (chance E[hits] = k²/n ≈ 0.2). MIPS ≠ cosine on this data: vector
    * norms vary, so the top-10 by inner product genuinely differs from
    * s01's cosine top-10. */
  def s12MipsTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    Similarity.withRecallContract(
      Similarity.mipsTopK(e, "vec_id", "embedding", q, 10),
      Similarity.mipsTopKQuantized(e, "vec_id", "embedding", q, 10,
        bandBits = 4, bandCount = 8),
      Seq("vec_id"), minHits = 4, flagCol = "mips_recall_ok")
      .orderBy(org.apache.spark.sql.functions.col("dot").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
  }

  val s12Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |gt AS (
      |  SELECT vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))),
      |      6) AS dot
      |  FROM embeddings, q
      |  ORDER BY dot DESC, vec_id ASC
      |  LIMIT 10)
      |SELECT vec_id, dot, TRUE AS mips_recall_ok FROM gt
      |ORDER BY dot DESC, vec_id ASC""".stripMargin

  // ---------------------------------------------------------------- s13
  /** MMR diversified selection ([[graft.operators.Retrieval.mmrSelect]]):
    * retrieve the cosine top-12 for the vec_id=0 query (the s01
    * distributed stage), then greedily pick 5 maximizing
    * 0.7·rel − 0.3·max-sim-to-already-picked — the relevance-vs-
    * redundancy re-rank RAG and few-shot-selection pipelines run. Every
    * rel and pairwise sim is rounded to 6 decimals before scoring, so
    * the DuckDB oracle replays the whole greedy walk in one recursive
    * CTE — the selection ORDER is part of the hashed surface (`step`). */
  def s13MmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    val cand = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 12)
      .withColumnRenamed("cos", "rel")
      .join(e, "vec_id")
    graft.operators.Retrieval.mmrSelect(cand, "vec_id", "embedding", "rel",
      k = 5)
      .orderBy(org.apache.spark.sql.functions.col("step"))
  }

  val s13Sql: String =
    """WITH RECURSIVE
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |cand AS (
      |  SELECT vec_id, embedding,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS rel
      |  FROM embeddings, q
      |  ORDER BY rel DESC, vec_id ASC
      |  LIMIT 12),
      |simm AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS sim
      |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
      |sel(step, picked, prev) AS (
      |  SELECT 1 AS step,
      |    (SELECT vec_id FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1)
      |      AS picked,
      |    []::BIGINT[] AS prev
      |  UNION ALL
      |  SELECT s.step + 1,
      |    (SELECT c.vec_id FROM cand c
      |     WHERE NOT list_contains(list_append(s.prev, s.picked), c.vec_id)
      |     ORDER BY ROUND(0.7 * c.rel - 0.3 *
      |         (SELECT MAX(m.sim) FROM simm m WHERE m.ia = c.vec_id
      |            AND list_contains(list_append(s.prev, s.picked), m.ib)),
      |         6) DESC,
      |       c.vec_id ASC
      |     LIMIT 1),
      |    list_append(s.prev, s.picked)
      |  FROM sel s WHERE s.step < 5)
      |SELECT s.step::INT AS step, s.picked AS vec_id, c.rel,
      |  COALESCE((SELECT MAX(m.sim) FROM simm m
      |            WHERE m.ia = s.picked AND list_contains(s.prev, m.ib)),
      |           0.0) AS maxsim,
      |  ROUND(0.7 * c.rel - 0.3 *
      |    COALESCE((SELECT MAX(m.sim) FROM simm m
      |              WHERE m.ia = s.picked AND list_contains(s.prev, m.ib)),
      |             0.0), 6) AS mmr
      |FROM sel s JOIN cand c ON c.vec_id = s.picked
      |ORDER BY step""".stripMargin

  // ---------------------------------------------------------------- s14
  /** Clustering-quality evaluation: simplified silhouette
    * ([[graft.operators.Embeddings.clusterSilhouette]]) of the
    * assignment induced by the 8 lowest-id vectors as centroids — the
    * report a pipeline runs after IVF/k-means training to decide whether
    * the partition is real. Global ×1024 quantization makes every
    * distance an integer and the per-point score an exact scaled
    * division, so the oracle replays assignment, both distances, and the
    * per-cluster rollup bit-for-bit. */
  def s14Silhouette(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val e = emb(spark, dir)
    graft.operators.Embeddings.clusterSilhouette(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 8), "vec_id", "embedding")
      .orderBy(col("cluster"))
  }

  val s14Sql: String =
    """WITH q AS (
      |  SELECT vec_id, LIST_TRANSFORM(embedding,
      |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cent AS (SELECT vec_id AS cid, qv AS cq FROM q WHERE vec_id < 8),
      |d AS (
      |  SELECT v.vec_id, c.cid,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v.qv) + 1),
      |      i -> (v.qv[i] - c.cq[i]) * (v.qv[i] - c.cq[i])))::BIGINT AS d2
      |  FROM q v CROSS JOIN cent c),
      |m1 AS (SELECT vec_id, MIN(d2) AS a2 FROM d GROUP BY 1),
      |asg AS (
      |  SELECT d.vec_id, MIN(d.cid) AS acid, MIN(m1.a2) AS a2
      |  FROM d JOIN m1 ON m1.vec_id = d.vec_id AND d.d2 = m1.a2
      |  GROUP BY 1),
      |b AS (
      |  SELECT d.vec_id, MIN(d.d2) AS b2
      |  FROM d JOIN asg ON asg.vec_id = d.vec_id AND d.cid <> asg.acid
      |  GROUP BY 1),
      |s AS (
      |  SELECT a.vec_id, a.acid, COALESCE(
      |    CAST(((b.b2::HUGEINT - a.a2) * 1000000)
      |         // NULLIF(GREATEST(a.a2, b.b2), 0)::HUGEINT AS BIGINT),
      |    0) AS sil_micro
      |  FROM asg a JOIN b ON b.vec_id = a.vec_id)
      |SELECT acid AS cluster, COUNT(*)::BIGINT AS n_points,
      |  SUM(sil_micro)::BIGINT AS sil_sum_micro,
      |  (SUM(sil_micro) // COUNT(*))::BIGINT AS avg_sil_micro
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- s15
  /** Recall@k CURVE of the quantized-LSH index against exact brute force
    * (k = 1, 5, 10) — the evaluation sweep an ANN deployment tunes
    * band/bit parameters against. Both sides are the gate-proven
    * deterministic rankings (s01's double-fold cosine, s06's integer
    * bucket decision), so the curve is exact: hits@k = |exact top-k ∩
    * approx top-k| under the (cos DESC, id ASC) total order, and the
    * oracle replays both rankings and the intersection count. Both
    * top-10 tables are k-bounded, so the rank windows and the 3-row
    * sweep join are driver-free constants, not data-scale work. */
  def s15RecallCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    // GLOBAL-WINDOW: bounded — ranks the two k-bounded top-10 tables
    // (scaladoc above), never the embedding corpus
    val rk = row_number().over(
      Window.orderBy(col("cos").desc, col("vec_id").asc))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select(col("vec_id"), rk.as("re"))
    val approx = Similarity.quantizedLshTopK(e, "vec_id", "embedding", q,
      10, bandBits = 4, bandCount = 8)
      .select(col("vec_id"), rk.as("ra"))
    val joined = exact.join(approx, "vec_id")
    val ks = Seq(1, 5, 10).toDF("k")
    val hits = ks.crossJoin(broadcast(joined))
      .filter(col("re") <= col("k") && col("ra") <= col("k"))
      .groupBy("k").agg(count(lit(1)).as("h"))
    ks.join(hits, Seq("k"), "left")
      .select(col("k").cast("long").as("k"),
        coalesce(col("h"), lit(0L)).as("hits"),
        expr("cast(coalesce(h, 0L) * 1000000 div k as bigint)")
          .as("recall_micro"))
      .orderBy("k")
  }

  val s15Sql: String =
    s"""WITH exact0 AS (
       |${s01Sql}
       |),
       |approx0 AS (
       |${s06Sql}
       |),
       |exact AS (
       |  SELECT vec_id,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS re
       |  FROM exact0),
       |approx AS (
       |  SELECT vec_id,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS ra
       |  FROM approx0),
       |ks AS (SELECT UNNEST([1, 5, 10]) AS k),
       |hits AS (
       |  SELECT k, COUNT(*) AS h
       |  FROM ks JOIN exact ON re <= k JOIN approx USING (vec_id)
       |  WHERE ra <= k GROUP BY k)
       |SELECT k::BIGINT AS k, COALESCE(h.h, 0)::BIGINT AS hits,
       |  CAST(COALESCE(h.h, 0) * 1000000 // k AS BIGINT) AS recall_micro
       |FROM ks LEFT JOIN hits h USING (k) ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- s16
  /** Incremental ANN index maintenance ([[Similarity.incrementalKnn]]):
    * vectors with vec_id % 10 = 7 arrive as today's batch against the
    * persisted bucket index of the rest — history is never re-bucketed
    * (the gate passes the stored [[Similarity.quantizedBandIndex]] rows,
    * honoring the d20 storeIndex contract), and each new vector reports
    * its exact-cosine top-3 among history-∪-batch candidates from the
    * (band, bucket) equi-probe. The oracle recomputes every bucket with
    * the s06 integer mirror, replays both probes (including the 1000-cap
    * resident rule), and re-ranks with the double-fold cosine. */
  def s16IncrementalIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = emb(spark, dir)
    val hist = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 7)
    val idx = Similarity.quantizedBandIndex(hist, "vec_id", "embedding",
      bandBits = 4, bandCount = 8)
    Similarity.incrementalKnn(idx, hist, batch, "vec_id", "embedding",
      k = 3, bandBits = 4, bandCount = 8, bucketCap = 1000)
      .orderBy("qid", "rank")
  }

  val s16Sql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |    LIST_TRANSFORM(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 128) AS BIGINT)) AS q
      |  FROM embeddings),
      |bk AS (
      |  SELECT vec_id, band,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, 4), bit ->
      |      CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q) + 1), i ->
      |          q[i] * ((((band * 4 + bit) * LEN(q) + (i - 1)) * 2654435761
      |                   + 40503) % 8191 - 4095)))
      |        >= 0 THEN 1 << bit ELSE 0 END)) AS bucket
      |  FROM qv CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS band)),
      |histr AS (
      |  SELECT vec_id, band, bucket FROM bk WHERE vec_id % 10 <> 7
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY band, bucket
      |                             ORDER BY vec_id) <= 1000),
      |batr AS (
      |  SELECT vec_id, band, bucket FROM bk WHERE vec_id % 10 = 7
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY band, bucket
      |                             ORDER BY vec_id) <= 1000),
      |cand AS (
      |  SELECT DISTINCT b.vec_id AS qid, h.vec_id AS nid
      |  FROM bk b JOIN histr h USING (band, bucket)
      |  WHERE b.vec_id % 10 = 7
      |  UNION
      |  SELECT DISTINCT b.vec_id, o.vec_id
      |  FROM bk b JOIN batr o USING (band, bucket)
      |  WHERE b.vec_id % 10 = 7 AND o.vec_id <> b.vec_id),
      |scored AS (
      |  SELECT c.qid, c.nid,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q.embedding) + 1),
      |        i -> CAST(q.embedding[i] AS DOUBLE)
      |             * CAST(n.embedding[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(n.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM cand c
      |  JOIN embeddings q ON q.vec_id = c.qid
      |  JOIN embeddings n ON n.vec_id = c.nid)
      |SELECT qid, rank, nid, cos FROM (
      |  SELECT qid, nid, cos,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |                       ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s17
  /** Quantized-LSH CONFIGURATION sweep — d23's tuning table for vectors:
    * three (bandBits, bandCount) splits of the same 32 projection bits
    * ((2,16) / (4,8) / (8,4)) measured for selectivity (how many corpus
    * vectors share ≥ 1 bucket with query 0) and exact recall@10 against
    * the s01 brute-force truth. Fewer bits per band ⇒ coarser buckets ⇒
    * more candidates and higher recall — the S-curve trade, measured,
    * for the index a deployment must parameterize. Bucket decisions are
    * the s06 integer arithmetic, so every candidate set and both counts
    * mirror exactly. */
  def s17LshConfigSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val q = Similarity.vectorOf(spark, dir, 0L)
    // GLOBAL-WINDOW: bounded — ranks k-bounded top-10 tables only
    val rk = row_number().over(
      Window.orderBy(col("cos").desc, col("vec_id").asc))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select(col("vec_id"), rk.as("re")).localCheckpoint()
    val rows = Seq((2, 16), (4, 8), (8, 4)).map { case (bits, bands) =>
      val qb = Similarity.quantizedBuckets(q, bits, bands)
      val cand = e.filter(graft.functions.VectorFunctions.qlshAnyMatch(
        col("embedding"), qb, bits)).select(col("vec_id"))
      val caught = cand.join(exact, "vec_id")
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(caught.agg(count(lit(1)).as("n_caught")))
        .select(lit(bits.toLong).as("band_bits"),
          lit(bands.toLong).as("band_count"),
          col("n_candidates"), col("n_caught"),
          expr("cast(n_caught * 1000000 div 10 as bigint)")
            .as("recall_micro"))
    }
    rows.reduce(_ unionAll _).orderBy("band_bits")
  }

  val s17Sql: String = {
    val perCfg = Seq((2, 16), (4, 8), (8, 4)).map { case (bits, bands) =>
      s"""bk_${bits} AS (
         |  SELECT vec_id, band,
         |    LIST_SUM(LIST_TRANSFORM(RANGE(0, $bits), bit ->
         |      CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q) + 1), i ->
         |          q[i] * ((((band * $bits + bit) * LEN(q) + (i - 1))
         |                   * 2654435761 + 40503) % 8191 - 4095)))
         |        >= 0 THEN 1 << bit ELSE 0 END)) AS bucket
         |  FROM qv CROSS JOIN (SELECT UNNEST(RANGE(0, $bands)) AS band)),
         |cand_${bits} AS (
         |  SELECT DISTINCT c.vec_id
         |  FROM bk_${bits} c
         |  JOIN (SELECT band, bucket FROM bk_${bits} WHERE vec_id = 0) qb
         |    ON c.band = qb.band AND c.bucket = qb.bucket),
         |row_${bits} AS (
         |  SELECT $bits::BIGINT AS band_bits, $bands::BIGINT AS band_count,
         |    (SELECT COUNT(*) FROM cand_${bits})::BIGINT AS n_candidates,
         |    (SELECT COUNT(*) FROM cand_${bits} c JOIN ex ON ex.vec_id =
         |       c.vec_id)::BIGINT AS n_caught)""".stripMargin
    }.mkString(",\n")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |    LIST_TRANSFORM(embedding,
       |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 128) AS BIGINT)) AS q
       |  FROM embeddings),
       |q0 AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
       |ex AS (
       |  SELECT vec_id FROM (
       |    SELECT e.vec_id, ROUND(
       |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
       |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |      / SQRT(LIST_SUM(LIST_TRANSFORM(qvec,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS cos
       |    FROM embeddings e CROSS JOIN q0
       |    ORDER BY cos DESC, e.vec_id ASC LIMIT 10)),
       |$perCfg
       |SELECT band_bits, band_count, n_candidates, n_caught,
       |  CAST(n_caught * 1000000 // 10 AS BIGINT) AS recall_micro
       |FROM (SELECT * FROM row_2 UNION ALL SELECT * FROM row_4
       |      UNION ALL SELECT * FROM row_8)
       |ORDER BY band_bits""".stripMargin
  }

  // ---------------------------------------------------------------- s18
  /** FILTERED vector search — the "where label = X" ANN query every
    * retrieval deployment needs (metadata predicate + similarity,
    * served together): top-5 per label class among candidates sharing a
    * quantized-LSH bucket with query 0, the filter applied BEFORE the
    * distance math so selectivity multiplies with the index instead of
    * post-filtering away the result set (the classic filtered-ANN
    * failure: post-filter a top-k and a selective predicate empties it).
    * Bucket decisions and the exact cosine rank are the s06 arithmetic,
    * so every per-class result row mirrors exactly; classes whose
    * candidates are empty are legitimately absent — the recall-vs-
    * selectivity surface s17 quantifies, sliced by predicate. */
  def s18FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val q = Similarity.vectorOf(spark, dir, 0L)
    val qb = Similarity.quantizedBuckets(q, 4, 8)
    val scored = e.filter(graft.functions.VectorFunctions.qlshAnyMatch(
        col("embedding"), qb, 4))
      .select(col("label").cast("long").as("label"), col("vec_id"),
        round(graft.functions.VectorFunctions.cosine(col("embedding"),
          array(q.toIndexedSeq.map(lit): _*)), 6).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("label"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("label", "rank")
  }

  val s18Sql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |    LIST_TRANSFORM(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 128) AS BIGINT)) AS q
      |  FROM embeddings),
      |bk AS (
      |  SELECT vec_id, band,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, 4), bit ->
      |      CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(q) + 1), i ->
      |          q[i] * ((((band * 4 + bit) * LEN(q) + (i - 1)) * 2654435761
      |                   + 40503) % 8191 - 4095)))
      |        >= 0 THEN 1 << bit ELSE 0 END)) AS bucket
      |  FROM qv CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS band)),
      |cand AS (
      |  SELECT DISTINCT c.vec_id
      |  FROM bk c JOIN (SELECT band, bucket FROM bk WHERE vec_id = 0) qb
      |    ON c.band = qb.band AND c.bucket = qb.bucket),
      |q0 AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT e.label::BIGINT AS label, e.vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(qvec,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id
      |  CROSS JOIN q0)
      |SELECT label, rank, vec_id, cos FROM (
      |  SELECT label, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY label
      |                       ORDER BY cos DESC, vec_id ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 5 ORDER BY label, rank""".stripMargin

  // ---------------------------------------------------------------- s19
  /** RANKING-metric evaluation ([[graft.operators.EvalMetrics
    * .rankingMetrics]]) of an exact retrieval run — the per-query
    * quality report every retrieval/RAG deployment computes: 5 probes
    * (vec_id < 5) retrieve their cosine top-10 over the corpus
    * EXCLUDING themselves (the s04 broadcast-probe shape with a
    * self-exclusion predicate), relevance = same `label`, and the
    * metrics are hits@10, recall@10, reciprocal rank of the first
    * same-label hit, and nDCG@10.
    *
    * Exactness: the only transcendental (log₂ discounts) is frozen into
    * the [[graft.operators.EvalMetrics.ndcgWeights]] integer table,
    * generated ONCE on the driver and embedded as the same literals in
    * both engines' queries; every division is a ×10⁶ integral
    * truncation. The run itself is the fully-mirrorable s04 cosine. */
  def s19RankingMetrics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val scored = e.join(broadcast(probes), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(graft.functions.VectorFunctions.cosine(col("embedding"),
          col("qv")), 6).as("cos"))
    val run = scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= 10)
    val rels = e.join(broadcast(probes.select(col("qid"), col("qlabel"))),
        col("label") === col("qlabel") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"))
    graft.operators.EvalMetrics.rankingMetrics(run, "qid", "vec_id", "rank",
      rels, "qid", "vec_id", k = 10).orderBy("qid")
  }

  /** Mirror: same cosine fold, same rank window, and the SAME integer
    * discount/prefix literals (generated by the one driver-side
    * [[graft.operators.EvalMetrics.ndcgWeights]] call both sides
    * share). */
  val s19Sql: String = {
    val w = graft.operators.EvalMetrics.ndcgWeights(10)
    val prefix = w.scanLeft(0L)(_ + _).tail
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
       |           FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    ROUND(
       |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
       |      / SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |      / SQRT(LIST_SUM(LIST_TRANSFORM(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
       |      6) AS cos
       |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
       |run AS (
       |  SELECT qid, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |                       ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored QUALIFY rank <= 10),
       |rels AS (
       |  SELECT q.qid, e.vec_id FROM embeddings e
       |  JOIN q ON e.label = q.qlabel AND e.vec_id <> q.qid),
       |nrel AS (SELECT qid, COUNT(*) AS n_rel FROM rels GROUP BY qid),
       |perq AS (
       |  SELECT r.qid,
       |    COUNT(*) AS n_ret,
       |    SUM(CASE WHEN j.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits,
       |    MIN(CASE WHEN j.vec_id IS NOT NULL THEN r.rank END) AS first_rel,
       |    SUM(CASE WHEN j.vec_id IS NOT NULL THEN
       |      [${w.mkString(",")}][CAST(r.rank AS INT)] ELSE 0 END) AS dcg
       |  FROM run r LEFT JOIN rels j
       |    ON j.qid = r.qid AND j.vec_id = r.vec_id
       |  GROUP BY r.qid)
       |SELECT p.qid, COALESCE(n.n_rel, 0)::BIGINT AS n_rel,
       |  p.n_ret::BIGINT AS n_ret, p.hits::BIGINT AS hits,
       |  COALESCE(1000000 // p.first_rel, 0)::BIGINT AS rr_micro,
       |  (p.hits * 1000000 // NULLIF(n.n_rel, 0))::BIGINT AS recall_micro,
       |  CASE WHEN COALESCE(n.n_rel, 0) >= 1 THEN
       |    (p.dcg * 1000000 //
       |     [${prefix.mkString(",")}][CAST(LEAST(n.n_rel, 10) AS INT)])::BIGINT
       |  END AS ndcg_micro
       |FROM perq p LEFT JOIN nrel n ON n.qid = p.qid
       |ORDER BY p.qid""".stripMargin
  }

  // ---------------------------------------------------------------- s20
  /** IVF-PQ ANN ([[Similarity.ivfPqTopK]]) under the s02/s03 accuracy-
    * contract shape: the row surface is the exact brute-force top-10
    * (fully mirrored by the s01 double-fold SQL) and the composed
    * two-level index — coarse IVF cells for partition pruning, one
    * corpus-trained PQ codebook for the in-cell ranking — runs in-engine
    * to produce `ivfpq_recall_ok`, pinned TRUE by the oracle. This is
    * the layout that actually ships at 100 TB (s03 stores raw floats
    * per cell; s09 scans every code): (cell, code) pairs partitioned by
    * cell, a query touching nprobe/nlist of the data through an integer
    * lookup table. Bound ≥ 3 of 10: the composition inherits BOTH
    * approximation losses (cell miss × code collision — measured 3–7/10
    * across SFs on this near-uniform corpus; chance is k²/n ≈ 0.2, so 3
    * is ~15× above chance). The high-recall regime on clustered data is
    * pinned separately in LlmOpsSpec. */
  def s20IvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    Similarity.withRecallContract(
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10),
      Similarity.ivfPqTopK(e, "vec_id", "embedding", q, 10,
        nlist = 16, nprobe = 4),
      Seq("vec_id"), minHits = 3, flagCol = "ivfpq_recall_ok")
      .orderBy(org.apache.spark.sql.functions.col("cos").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
  }

  val s20Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |gt AS (
      |  SELECT vec_id,
      |    ROUND(
      |      LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      / SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |      6) AS cos
      |  FROM embeddings, q
      |  ORDER BY cos DESC, vec_id ASC
      |  LIMIT 10)
      |SELECT vec_id, cos, TRUE AS ivfpq_recall_ok FROM gt
      |ORDER BY cos DESC, vec_id ASC""".stripMargin

  // ---------------------------------------------------------------- s21
  /** IVF nprobe TUNING sweep (the knob every IVF deployment dials):
    * recall@10 of s03's IVF index at nprobe ∈ {1, 2, 4, 16} over
    * nlist = 16 cells, reported as the two invariants a correct IVF
    * must satisfy — (a) recall is MONOTONE non-decreasing in nprobe
    * (probing more cells only grows the candidate set, and a candidate
    * displacing a true-top-k hit from the approx top-k has higher
    * cosine, hence is itself a true-top-k hit) and (b) the full probe
    * nprobe = nlist scans every cell, so its top-k equals exact brute
    * force. Both hold deterministically, so the oracle pins the
    * contract constants — the s03/s20 accuracy-contract pattern. */
  def s21IvfNprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = Similarity.vectorOf(spark, dir, 0L)
    val e = emb(spark, dir)
    // train the coarse quantizer ONCE; the sweep only varies the probe
    // width (four ivfTopK calls would re-run the seed collect + Lloyd
    // corpus scans for bit-identical centroids)
    val centroids = Similarity.ivfCentroids(e, "vec_id", "embedding",
      nlist = 16)
    val sweeps = Seq(1, 2, 4, 16).map { np =>
      Similarity.ivfTopKWith(e, "vec_id", "embedding", centroids, q, 10,
          nprobe = np)
        .select(col("vec_id")).withColumn("nprobe", lit(np.toLong))
    }.reduce(_ unionByName _)
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select(col("vec_id"))
    val hits = sweeps.join(broadcast(exact), "vec_id")
      .groupBy("nprobe").agg(count(lit(1)).as("hits"))
    // GLOBAL-WINDOW: bounded — lag over the 4-row nprobe sweep
    val w = Window.orderBy("nprobe")
    Seq(1L, 2L, 4L, 16L).toDF("nprobe")
      .join(hits, Seq("nprobe"), "left").na.fill(0L, Seq("hits"))
      .withColumn("prev", lag(col("hits"), 1).over(w))
      .select(col("nprobe"),
        (col("prev").isNull || col("hits") >= col("prev"))
          .as("monotone_ok"),
        (col("nprobe") < 16 || col("hits") === 10).as("full_exact_ok"))
      .orderBy("nprobe")
  }

  val s21Sql: String =
    """SELECT UNNEST([1, 2, 4, 16])::BIGINT AS nprobe,
      |  TRUE AS monotone_ok, TRUE AS full_exact_ok
      |ORDER BY nprobe""".stripMargin

  // ---------------------------------------------------------------- s22
  /** Embedding-space ANISOTROPY probe — the "is this embedding space
    * collapsed?" health check (Ethayarajh 2019): the cosine distribution
    * over a deterministic unrelated-pair sample (vector i paired with
    * vector i + ⌊N/2⌋ — a fixed derangement-style shift, no RNG). A
    * healthy space piles mass near 0; mass near 1 means the encoder
    * collapsed. Reported as a 10-bucket histogram of s01's
    * ROUND(cos, 6) doubles with per-bucket envelopes. The pair join is
    * a shifted equi-join on vec_id (co-partitioned, exactly ⌊N/2⌋
    * pairs), never a sampled cross join. */
  def s22Anisotropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = emb(spark, dir)
    val n = e.agg(count(lit(1)).as("n"))
    val a = e.crossJoin(broadcast(n))
      .select((col("vec_id") + expr("n div 2")).as("pid"),
        col("embedding").as("emb_a"))
    val pairs = a.join(
      e.select(col("vec_id").as("pid"), col("embedding").as("emb_b")),
      "pid")
    pairs
      .select(round(graft.functions.VectorFunctions.cosine(
        col("emb_a"), col("emb_b")), 6).as("cos"))
      .withColumn("bucket",
        least(lit(9L), floor((col("cos") + 1.0d) * 5.0d).cast("bigint")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        min(col("cos")).as("min_cos"), max(col("cos")).as("max_cos"))
      .orderBy("bucket")
  }

  val s22Sql: String =
    """WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
      |pairs AS (
      |  SELECT a.embedding AS ea, b.embedding AS eb
      |  FROM embeddings a, n
      |  JOIN embeddings b ON b.vec_id = a.vec_id + n.n // 2),
      |c AS (
      |  SELECT ROUND(
      |    LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(ea) + 1),
      |      i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(ea,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |    / SQRT(LIST_SUM(LIST_TRANSFORM(eb,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS cos
      |  FROM pairs)
      |SELECT LEAST(9, CAST(FLOOR((cos + 1.0) * 5.0) AS BIGINT))
      |    AS bucket,
      |  COUNT(*)::BIGINT AS n_pairs,
      |  MIN(cos) AS min_cos, MAX(cos) AS max_cos
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- s23
  /** Embedding NORM census — the scale-collapse companion to s22's
    * angular probe: the distribution of squared L2 norms (norm², the
    * same in-order double fold both engines replay; no sqrt needed for
    * a census). A spike at 0 is a dead encoder; a long right tail is an
    * un-normalized one — both break cosine ANN assumptions and must be
    * caught before index build. Row-local fold + one ≤buckets partial
    * agg. */
  def s23NormCensus(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    emb(spark, dir)
      .select(round(expr(
        """aggregate(embedding, cast(0.0 as double),
          |  (acc, x) -> acc + cast(x as double) * cast(x as double))"""
          .stripMargin), 6).as("norm2"))
      .withColumn("bucket",
        least(lit(19L), floor(col("norm2") * 10.0d).cast("bigint")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"),
        min(col("norm2")).as("min_norm2"),
        max(col("norm2")).as("max_norm2"))
      .orderBy("bucket")
  }

  val s23Sql: String =
    """WITH n AS (
      |  SELECT ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm2
      |  FROM embeddings)
      |SELECT LEAST(19, CAST(FLOOR(norm2 * 10.0) AS BIGINT)) AS bucket,
      |  COUNT(*)::BIGINT AS n_vecs,
      |  MIN(norm2) AS min_norm2, MAX(norm2) AS max_norm2
      |FROM n GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "s24_pq_distortion" -> (s24PqDistortion _, s24Sql),
    "s23_norm_census" -> (s23NormCensus _, s23Sql),
    "s22_anisotropy" -> (s22Anisotropy _, s22Sql),
    "s21_ivf_nprobe_sweep" -> (s21IvfNprobeSweep _, s21Sql),
    "s20_ann_ivfpq" -> (s20IvfPqTopK _, s20Sql),
    "s19_ranking_metrics" -> (s19RankingMetrics _, s19Sql),
    "s18_filtered_ann" -> (s18FilteredAnn _, s18Sql),
    "s17_lsh_config_sweep" -> (s17LshConfigSweep _, s17Sql),
    "s16_incremental_index" -> (s16IncrementalIndex _, s16Sql),
    "s15_recall_curve" -> (s15RecallCurve _, s15Sql),
    "s14_silhouette" -> (s14Silhouette _, s14Sql),
    "s13_mmr_diversify" -> (s13MmrDiversify _, s13Sql),
    "s12_mips" -> (s12MipsTopK _, s12Sql),
    "s11_embedding_drift" -> (s11EmbeddingDrift _, s11Sql),
    "s09_ann_pq" -> (s09PqTopK _, s09Sql),
    "s10_hard_negatives" -> (s10HardNegatives _, s10Sql),
    "s01_ann_bruteforce" -> (s01BruteForceTopK _, s01Sql),
    "s02_ann_lsh" -> (s02LshTopK _, s02Sql),
    "s03_ann_ivf" -> (s03IvfTopK _, s03Sql),
    "s04_knn_join" -> (s04KnnJoin _, s04Sql),
    "s05_knn_join_lsh" -> (s05KnnJoinLsh _, s05Sql),
    "s06_ann_qlsh" -> (s06QuantizedLsh _, s06Sql),
    "s07_embedding_quantize" -> (s07QuantizeAudit _, s07Sql),
    "s08_knn_join_qlsh" -> (s08KnnJoinQuantized _, s08Sql),
  )
}
