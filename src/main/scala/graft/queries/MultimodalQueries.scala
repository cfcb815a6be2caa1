package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal queries: a fake media corpus carrying REAL container headers
  * (PNG IHDR for images, RIFF/WAVE `fmt ` for audio, ISO-BMFF
  * ftyp+moov/mvhd/tkhd/stts/stsz for half the video rows — planted by
  * [[Multimodal.fakeMediaFrame]] with dimensions/frame counts/sample sizes
  * derived from doc_id) through the batched per-partition decode
  * ([[Multimodal.decodeBatch]]).
  *
  * m01-m03 verify byte-level HEADER parsing (the decoder must parse the
  * planted headers back out; headerless video rows pin the deterministic
  * stub fallback). m04-m06 go further and verify REAL pixel/sample decode
  * through the JDK's own codecs — ImageIO pixel stats and raster resize,
  * javax.sound PCM sample stats. Only video frame PIXELS remain stubbed:
  * the JDK ships no video codec (environment-bound), though m02's frame
  * counts, per-frame byte sizes, and start times are real stts/stsz
  * sample-table walks. */
object MultimodalQueries {

  /** Ids/records fanned out for CODEC work: row-local decode/encode is
    * CPU-heavy relative to its tiny input, and Spark's size-based file
    * packing puts a whole small-file corpus into ONE scan partition —
    * which serializes the codec mapPartitions on a single core (measured
    * at the r17 10x stress: m18 ran single-task, identical wall time at
    * local[4] and local[32]). Repartitioning the fixed-width rows to the
    * session's default parallelism is a negligible shuffle that restores
    * full-core codec throughput at any corpus/file layout. */
  private def fanOut[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)

  def m01DecodeMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Multimodal.withDecodedMeta(
      Multimodal.fakeMediaFrame(docs), "doc_id", "payload", "modality")
      .toDF()
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        col("width").cast("bigint").as("width"),
        col("height").cast("bigint").as("height"),
        col("channels").cast("bigint").as("channels"),
        col("n_frames").cast("bigint").as("n_frames"))
      .orderBy("doc_id")
  }

  /** Image/audio rows: header fields the decoder must parse back out of
    * the planted PNG (33-byte prefix) / WAV (36-byte prefix) headers.
    * Video rows with doc_id % 6 = 2: REAL MP4 parse — tkhd dimensions and
    * the stts frame-count total behind a planted 300 + 4·n_frames-byte
    * container (the variable tail is the stsz sample-size table).
    * Video rows with doc_id % 6 = 5: the stub fallback over raw text. */
  val m01Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    COALESCE(STRLEN(text), 0) AS n,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    doc_id % 6 = 2 AS mp4
      |  FROM documents)
      |SELECT doc_id, modality,
      |  (CASE modality WHEN 'image' THEN n + 33 WHEN 'audio' THEN n + 36
      |        ELSE n + CASE WHEN mp4 THEN 300 + 4 * (1 + doc_id % 29) ELSE 0 END
      |   END)::BIGINT AS n_bytes,
      |  (CASE modality WHEN 'image' THEN 16 + doc_id % 624
      |        WHEN 'audio' THEN 8000 * (1 + doc_id % 5)
      |        ELSE CASE WHEN mp4 THEN 16 + doc_id % 624 ELSE 16 + n % 624 END
      |   END)::BIGINT AS width,
      |  (CASE modality WHEN 'image' THEN 16 + doc_id % 464
      |        WHEN 'audio' THEN 16
      |        ELSE CASE WHEN mp4 THEN 16 + doc_id % 464 ELSE 16 + n % 464 END
      |   END)::BIGINT AS height,
      |  (CASE modality WHEN 'image' THEN 3
      |        WHEN 'audio' THEN 1 + doc_id % 2
      |        ELSE 3 END)::BIGINT AS channels,
      |  (CASE WHEN modality = 'video' THEN
      |        CASE WHEN mp4 THEN 1 + doc_id % 29 ELSE 1 + n % 29 END
      |   ELSE 1 END)::BIGINT AS n_frames
      |FROM base ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m02
  /** Frame sampling: every 5th frame of each fake video — the one-row-in,
    * k-rows-out fan-out a video pipeline runs before per-frame featurizing.
    * For the planted-MP4 rows (doc_id % 6 = 2) the frame count is the REAL
    * stts total and every sampled frame carries its REAL stsz byte size
    * and stts start tick — the oracle mirrors the planted sample-table
    * arithmetic (size 64 + (doc_id + i) % 191, start i·20 ticks). Raw rows
    * (doc_id % 6 = 5) pin the deterministic stub count with NULL sample
    * metadata. */
  def m02FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Multimodal.sampleFrames(
      Multimodal.fakeMediaFrame(docs), "doc_id", "payload", "modality",
      stride = 5)
      .toDF()
      .select(col("doc_id"),
        col("frame_idx").cast("bigint").as("frame_idx"),
        col("n_frames").cast("bigint").as("n_frames"),
        col("frame_bytes"), col("t_ticks"))
      .orderBy("doc_id", "frame_idx")
  }

  val m02Sql: String =
    """WITH v AS (
      |  SELECT doc_id, doc_id % 6 = 2 AS mp4,
      |    CASE WHEN doc_id % 6 = 2 THEN 1 + doc_id % 29
      |         ELSE 1 + COALESCE(STRLEN(text), 0) % 29 END AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT doc_id, mp4, n_frames,
      |    UNNEST(RANGE(0, n_frames, 5)) AS frame_idx
      |  FROM v)
      |SELECT doc_id, frame_idx::BIGINT AS frame_idx,
      |  n_frames::BIGINT AS n_frames,
      |  (CASE WHEN mp4 THEN 64 + (doc_id + frame_idx) % 191 END)::BIGINT AS frame_bytes,
      |  (CASE WHEN mp4 THEN frame_idx * 20 END)::BIGINT AS t_ticks
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- m09
  /** Shot-change KEYFRAME selection over a synthesized frame stream: each
    * "video" (every 3rd doc) yields 6–12 frames as REAL 9×8 gradient
    * PNGs whose seed advances every 4 frames (a 4-frame "shot"); every
    * frame is perceptually hashed through the real decode path
    * ([[Multimodal.dHash64]] — real PNG decode (hand-rolled codec), block means, 64-bit
    * gradient hash), and a frame is a keyframe iff it's the first or its
    * hamming distance to the PREVIOUS frame's hash is nonzero — the
    * dedup-adjacent-frames primitive of video ingestion. Decode is
    * mapPartitions (binary codec work, the right tool); everything after
    * is one per-video lag window. The oracle reproduces the dHash in
    * closed form (m07's verified pixel formula), the lag, and the
    * bit_count, exactly. */
  def m09KeyframeSelect(spark: SparkSession, dir: String): DataFrame =
    m09Keyframes(spark, dir).orderBy("doc_id", "frame_idx")

  /** m09's keyframe stream WITHOUT the presentation sort — the shape m14
    * composes on (its own window re-partitions by doc_id; a global sort
    * in between would be a wasted range exchange). */
  private def m09Keyframes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .withColumn("n_frames", (lit(6) + pmod(col("doc_id"), lit(7))).cast("int"))
      .select(col("doc_id"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      .as[(Long, Int)]
    val hashed = fanOut(frames).mapPartitions(_.map { case (id, fi) =>
      val seed = id + 13L * (fi / 4) // new seed every 4 frames = a shot
      val png = Multimodal.gradientPng(9, 8, seed)
      val (_, _, hi, lo) = Multimodal.dHash64(png).get
      (id, fi.toLong, hi, lo)
    }).toDF("doc_id", "frame_idx", "h_hi", "h_lo")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    hashed
      .withColumn("p_hi", lag(col("h_hi"), 1).over(w))
      .withColumn("p_lo", lag(col("h_lo"), 1).over(w))
      .withColumn("hamming", when(col("p_hi").isNull, lit(null))
        .otherwise(expr("bit_count(h_hi ^ p_hi) + bit_count(h_lo ^ p_lo)"))
        .cast("long"))
      .withColumn("keyframe",
        when(col("hamming").isNull || col("hamming") > 0, 1).otherwise(0))
      .select(col("doc_id"), col("frame_idx"), col("hamming"),
        col("keyframe"))
  }

  val m09Sql: String =
    """WITH v AS (
      |  SELECT doc_id, 6 + doc_id % 7 AS n_frames
      |  FROM documents WHERE doc_id % 3 = 1),
      |fr AS (
      |  SELECT doc_id, UNNEST(RANGE(0, n_frames)) AS frame_idx FROM v),
      |sd AS (
      |  SELECT doc_id, frame_idx,
      |    doc_id + 13 * (frame_idx // 4) AS seed
      |  FROM fr),
      |bits AS (
      |  SELECT doc_id, frame_idx, (t2.y * 8 + t1.x)::INT AS idx,
      |    CASE WHEN (seed + 3 * t1.x + 7 * t2.y) % 256
      |            > (seed + 3 * (t1.x + 1) + 7 * t2.y) % 256
      |         THEN 1 ELSE 0 END AS bit
      |  FROM sd
      |  CROSS JOIN RANGE(0, 8) t1(x)
      |  CROSS JOIN RANGE(0, 8) t2(y)),
      |hashed AS (
      |  SELECT doc_id, frame_idx,
      |    SUM(CASE WHEN idx >= 32 THEN bit::BIGINT << (idx - 32)
      |             ELSE 0 END)::BIGINT AS h_hi,
      |    SUM(CASE WHEN idx < 32 THEN bit::BIGINT << idx
      |             ELSE 0 END)::BIGINT AS h_lo
      |  FROM bits GROUP BY 1, 2),
      |lagged AS (
      |  SELECT doc_id, frame_idx, h_hi, h_lo,
      |    LAG(h_hi) OVER w AS p_hi, LAG(h_lo) OVER w AS p_lo
      |  FROM hashed
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
      |SELECT doc_id, frame_idx::BIGINT AS frame_idx,
      |  (CASE WHEN p_hi IS NULL THEN NULL
      |        ELSE bit_count(xor(h_hi, p_hi)) + bit_count(xor(h_lo, p_lo))
      |   END)::BIGINT AS hamming,
      |  (CASE WHEN p_hi IS NULL
      |         OR bit_count(xor(h_hi, p_hi)) + bit_count(xor(h_lo, p_lo)) > 0
      |        THEN 1 ELSE 0 END)::INT AS keyframe
      |FROM lagged ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- m03
  /** Resize-to-fit 224x224: source dimensions are PARSED from each planted
    * PNG IHDR; the aspect-preserving fit is pure integer arithmetic
    * (truncating division) mirrored exactly by the oracle. */
  def m03Resize(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Multimodal.resizeImages(
      Multimodal.fakeMediaFrame(docs), "doc_id", "payload", "modality",
      targetW = 224, targetH = 224)
      .toDF()
      .select(col("doc_id"),
        col("width").cast("bigint").as("width"),
        col("height").cast("bigint").as("height"),
        col("out_w").cast("bigint").as("out_w"),
        col("out_h").cast("bigint").as("out_h"))
      .orderBy("doc_id")
  }

  val m03Sql: String =
    """WITH img AS (
      |  SELECT doc_id,
      |    16 + doc_id % 624 AS w,
      |    16 + doc_id % 464 AS h
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
      |  (CASE WHEN w <= 224 AND h <= 224 THEN w
      |        WHEN w * 224 <= h * 224 THEN GREATEST(1, (w * 224) // h)
      |        ELSE 224 END)::BIGINT AS out_w,
      |  (CASE WHEN w <= 224 AND h <= 224 THEN h
      |        WHEN w * 224 <= h * 224 THEN 224
      |        ELSE GREATEST(1, (h * 224) // w) END)::BIGINT AS out_h
      |FROM img ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m04
  /** REAL pixel decode, fully oracled: each image-modality doc becomes a
    * genuine zlib-compressed solid-color PNG (dimensions and RGB derived
    * from doc_id), encoded AND decoded through the JDK's ImageIO inside
    * one mapPartitions pass — actual deflate/inflate + raster walk, not a
    * stub. A solid color makes the channel means exact integers, so the
    * oracle is pure doc_id arithmetic: any decode deviation (wrong pixel,
    * wrong dimension, color-space drift) breaks the hash match. */
  def m04PixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val w = (4 + id % 13).toInt
      val h = (3 + id % 7).toInt
      val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) |
        ((id * 13) % 256)).toInt
      val png = Multimodal.solidPng(w, h, rgb)
      val st = Multimodal.decodePixelStats(png).get
      (id, st.width.toLong, st.height.toLong, st.meanR, st.meanG, st.meanB,
        st.nPixels)
    }).toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
      "n_pixels")
      .orderBy("doc_id")
  }

  val m04Sql: String =
    """SELECT doc_id,
      |  (4 + doc_id % 13)::BIGINT AS width,
      |  (3 + doc_id % 7)::BIGINT AS height,
      |  (doc_id % 256)::DOUBLE AS mean_r,
      |  ((doc_id * 7) % 256)::DOUBLE AS mean_g,
      |  ((doc_id * 13) % 256)::DOUBLE AS mean_b,
      |  ((4 + doc_id % 13) * (3 + doc_id % 7))::BIGINT AS n_pixels
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m05
  /** REAL audio sample decode, fully oracled: each audio-modality doc
    * becomes a genuine playable mono 16-bit PCM WAV whose samples are a
    * doc_id-derived integer sequence, decoded back through javax.sound —
    * actual frame streaming, not a stub. Amplitude stats are exact
    * integer arithmetic (one double division for the mean), mirrored by
    * list arithmetic in the oracle. */
  def m05AudioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val n = (50 + id % 30).toInt
      val rate = (8000L * (1 + id % 5)).toInt
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i.toLong * 17) % 65521) - 32760).toShort)
      val wav = Multimodal.pcmWav(rate, samples)
      val st = Multimodal.decodeAudioStats(wav).get
      (id, st.sampleRate.toLong, st.channels.toLong, st.nSamples,
        st.meanAmp, st.maxAbs)
    }).toDF("doc_id", "sample_rate", "channels", "n_samples", "mean_amp",
      "max_abs")
      .withColumn("mean_amp", round(col("mean_amp"), 6))
      .orderBy("doc_id")
  }

  val m05Sql: String =
    """WITH a AS (
      |  SELECT doc_id, 50 + doc_id % 30 AS n, 8000 * (1 + doc_id % 5) AS rate
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT doc_id, n, rate,
      |    LIST_TRANSFORM(RANGE(0, n),
      |      i -> (doc_id * 31 + i * 17) % 65521 - 32760) AS xs
      |  FROM a)
      |SELECT doc_id,
      |  rate::BIGINT AS sample_rate,
      |  1::BIGINT AS channels,
      |  n::BIGINT AS n_samples,
      |  ROUND(LIST_SUM(xs)::DOUBLE / n, 6) AS mean_amp,
      |  LIST_MAX(LIST_TRANSFORM(xs, x -> ABS(x)))::BIGINT AS max_abs
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m06
  /** REAL end-to-end resize, fully oracled: solid PNG (doc_id-derived
    * dims spanning both shrink and no-op cases) → [[Multimodal
    * .resizeImagePayload]] (real decode, nearest-neighbor resample, real
    * re-encode) → [[Multimodal.decodePixelStats]] on the RESIZED bytes.
    * The oracle recomputes the integer fit and — because nearest-neighbor
    * over a solid image preserves every channel exactly — the means. */
  def m06RealResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val w = (4 + id % 40).toInt
      val h = (3 + id % 25).toInt
      val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) |
        ((id * 13) % 256)).toInt
      val resized = Multimodal.resizeImagePayload(
        Multimodal.solidPng(w, h, rgb), 16, 16).get
      val st = Multimodal.decodePixelStats(resized).get
      (id, w.toLong, h.toLong, st.width.toLong, st.height.toLong,
        st.meanR, st.meanG, st.meanB)
    }).toDF("doc_id", "in_w", "in_h", "out_w", "out_h",
      "mean_r", "mean_g", "mean_b")
      .orderBy("doc_id")
  }

  val m06Sql: String =
    """WITH img AS (
      |  SELECT doc_id, 4 + doc_id % 40 AS w, 3 + doc_id % 25 AS h
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, w::BIGINT AS in_w, h::BIGINT AS in_h,
      |  (CASE WHEN w <= 16 AND h <= 16 THEN w
      |        WHEN w * 16 <= h * 16 THEN GREATEST(1, (w * 16) // h)
      |        ELSE 16 END)::BIGINT AS out_w,
      |  (CASE WHEN w <= 16 AND h <= 16 THEN h
      |        WHEN w * 16 <= h * 16 THEN 16
      |        ELSE GREATEST(1, (h * 16) // w) END)::BIGINT AS out_h,
      |  (doc_id % 256)::DOUBLE AS mean_r,
      |  ((doc_id * 7) % 256)::DOUBLE AS mean_g,
      |  ((doc_id * 13) % 256)::DOUBLE AS mean_b
      |FROM img ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m07
  /** Perceptual image hashing (dHash) over REAL decoded pixels — the
    * image-side near-duplicate signal a multimodal corpus dedups on.
    * Each image-modality doc becomes a genuine gradient PNG
    * ([[Multimodal.gradientPng]]: gray = (id + 3x + 7y) mod 256) at
    * dHash-exact dimensions (w = 9·(1 + id mod 3), h = 8·(1 + id mod 2));
    * [[Multimodal.dHash64]] decodes it back (hand-rolled PNG codec) and folds
    * 9×8 integer block means into 64 comparison bits. Because the
    * gradient's block differences depend on id only through mod-256
    * wraparound, many images share a hash — `n_same_hash` groups them,
    * which IS perceptual dedup. Every step is integer arithmetic, so the
    * oracle regenerates pixels and reproduces both hash halves exactly. */
  def m07PerceptualHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .as[Long]
    val hashed = fanOut(ids).mapPartitions(_.map { id =>
      val w = (9 * (1 + id % 3)).toInt
      val h = (8 * (1 + id % 2)).toInt
      val png = Multimodal.gradientPng(w, h, id)
      val (dw, dh, hi, lo) = Multimodal.dHash64(png).get
      (id, dw.toLong, dh.toLong, hi, lo)
    }).toDF("doc_id", "width", "height", "dhash_hi", "dhash_lo")
    hashed
      .withColumn("n_same_hash",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("dhash_hi"), col("dhash_lo"))))
      .orderBy("doc_id")
  }

  val m07Sql: String =
    """WITH imgs AS (
      |  SELECT doc_id, 9 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT doc_id, w, h, UNNEST(RANGE(0, w * h)) AS p FROM imgs),
      |blocks AS (
      |  SELECT doc_id, w, h,
      |    (p % w) // (w // 9) AS cx, (p // w) // (h // 8) AS cy,
      |    SUM((doc_id + 3 * (p % w) + 7 * (p // w)) % 256) AS s
      |  FROM px GROUP BY 1, 2, 3, 4, 5),
      |means AS (
      |  SELECT doc_id, w, h, cx, cy,
      |    (s // ((w // 9) * (h // 8)))::BIGINT AS m
      |  FROM blocks),
      |bits AS (
      |  SELECT a.doc_id, a.w, a.h, (a.cy * 8 + a.cx)::INT AS idx,
      |    CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS bit
      |  FROM means a JOIN means b
      |    ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
      |  WHERE a.cx < 8),
      |hashed AS (
      |  SELECT doc_id, MIN(w)::BIGINT AS width, MIN(h)::BIGINT AS height,
      |    SUM(CASE WHEN idx >= 32 THEN bit::BIGINT << (idx - 32) ELSE 0 END)
      |      ::BIGINT AS dhash_hi,
      |    SUM(CASE WHEN idx < 32 THEN bit::BIGINT << idx ELSE 0 END)
      |      ::BIGINT AS dhash_lo
      |  FROM bits GROUP BY 1)
      |SELECT doc_id, width, height, dhash_hi, dhash_lo,
      |  COUNT(*) OVER (PARTITION BY dhash_hi, dhash_lo) AS n_same_hash
      |FROM hashed ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m10
  /** Perceptual NEAR-dup join over dHash — the visual twin of d03's
    * SimHash banding, built on m07's verified hash path.
    *
    * The scalable shape: the corpus first collapses to DISTINCT hashes
    * (one fixed-width groupBy carrying a representative id and a
    * multiplicity — identical-hash images are exact perceptual dups and
    * never enter the pair join; at sf0.1 that is 1667 images → 94
    * hashes, and at 100 TB it bounds the join by unique-image count, not
    * corpus size). Distinct hashes then band into 4 chunks of 16 bits:
    * by pigeonhole any pair within Hamming distance 3 shares a chunk, so
    * the candidate set is an equi-join on (chunk, cval) — never hash².
    * Every step is integer arithmetic over the m07 hash, so the oracle
    * reproduces the exact result set (unlike float-LSH, where bucket
    * boundaries are IEEE-sensitive). */
  def m10PerceptualNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .as[Long]
    val hashed = fanOut(ids).mapPartitions(_.map { id =>
      val w = (9 * (1 + id % 3)).toInt
      val h = (8 * (1 + id % 2)).toInt
      val (_, _, hi, lo) = Multimodal.dHash64(
        Multimodal.gradientPng(w, h, id)).get
      (id, hi, lo)
    }).toDF("doc_id", "hi", "lo")
    val grp = hashed.groupBy(col("hi"), col("lo"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"))
    val chunked = grp.select(col("rep"), col("hi"), col("lo"), col("cnt"),
      posexplode(array(
        col("lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("chunk", "cval")))
    val l = chunked.select(col("rep").as("rep_a"), col("hi").as("hi_a"),
      col("lo").as("lo_a"), col("cnt").as("cnt_a"), col("chunk"), col("cval"))
    val r = chunked.select(col("rep").as("rep_b"), col("hi").as("hi_b"),
      col("lo").as("lo_b"), col("cnt").as("cnt_b"), col("chunk"), col("cval"))
    l.join(r, Seq("chunk", "cval"))
      .filter(col("rep_a") < col("rep_b"))
      .dropDuplicates("rep_a", "rep_b")
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("rep_a"), col("rep_b"), col("hamming"), col("cnt_a"),
        col("cnt_b"))
      .orderBy("rep_a", "rep_b")
  }

  val m10Sql: String =
    """WITH imgs AS (
      |  SELECT doc_id, 9 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (SELECT doc_id, w, h, UNNEST(RANGE(0, w * h)) AS p FROM imgs),
      |blocks AS (
      |  SELECT doc_id, w, h, (p % w) // (w // 9) AS cx, (p // w) // (h // 8) AS cy,
      |    SUM((doc_id + 3 * (p % w) + 7 * (p // w)) % 256) AS s
      |  FROM px GROUP BY 1,2,3,4,5),
      |means AS (SELECT doc_id, w, h, cx, cy, (s // ((w // 9) * (h // 8)))::BIGINT AS m FROM blocks),
      |bits AS (
      |  SELECT a.doc_id, (a.cy * 8 + a.cx)::INT AS idx,
      |    CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS bit
      |  FROM means a JOIN means b ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
      |  WHERE a.cx < 8),
      |hashed AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN idx >= 32 THEN bit::BIGINT << (idx - 32) ELSE 0 END)::BIGINT AS hi,
      |    SUM(CASE WHEN idx < 32 THEN bit::BIGINT << idx ELSE 0 END)::BIGINT AS lo
      |  FROM bits GROUP BY 1),
      |grp AS (SELECT hi, lo, MIN(doc_id) AS rep, COUNT(*)::BIGINT AS cnt
      |        FROM hashed GROUP BY 1, 2),
      |chunked AS (
      |  SELECT rep, hi, lo, cnt, c.chunk,
      |    CASE c.chunk WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
      |                 WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS cval
      |  FROM grp, (SELECT UNNEST(RANGE(0,4)) AS chunk) c),
      |pairs AS (
      |  SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b, a.hi AS hi_a,
      |    a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b, a.cnt AS cnt_a,
      |    b.cnt AS cnt_b
      |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.cval = b.cval
      |  WHERE a.rep < b.rep)
      |SELECT rep_a, rep_b,
      |  (BIT_COUNT(XOR(hi_a, hi_b)) + BIT_COUNT(XOR(lo_a, lo_b)))::BIGINT AS hamming,
      |  cnt_a, cnt_b
      |FROM pairs
      |WHERE BIT_COUNT(XOR(hi_a, hi_b)) + BIT_COUNT(XOR(lo_a, lo_b)) <= 3
      |ORDER BY rep_a, rep_b""".stripMargin

  // ---------------------------------------------------------------- m08
  /** REAL end-to-end audio resample, fully oracled: planted PCM WAV
    * (m05's doc_id-derived samples) → [[Multimodal.resampleAudioPayload]]
    * (real javax.sound decode, integer decimation, real WAV re-encode) →
    * [[Multimodal.decodeAudioStats]] on the RESAMPLED bytes. Decimation
    * keeps samples at indices 0, f, 2f, … so the oracle selects the same
    * arithmetic subsequence and reproduces rate, count, mean, and peak
    * exactly. */
  def m08AudioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val n = (50 + id % 30).toInt
      val rate = (8000L * (1 + id % 5)).toInt
      val f = (1 + id % 3).toInt
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i.toLong * 17) % 65521) - 32760).toShort)
      val out = Multimodal.resampleAudioPayload(
        Multimodal.pcmWav(rate, samples), f).get
      val st = Multimodal.decodeAudioStats(out).get
      (id, f.toLong, st.sampleRate.toLong, st.nSamples, st.meanAmp,
        st.maxAbs)
    }).toDF("doc_id", "factor", "out_rate", "out_samples", "mean_amp",
      "max_abs")
      .withColumn("mean_amp", round(col("mean_amp"), 6))
      .orderBy("doc_id")
  }

  val m08Sql: String =
    """WITH a AS (
      |  SELECT doc_id, 50 + doc_id % 30 AS n, 8000 * (1 + doc_id % 5) AS rate,
      |         1 + doc_id % 3 AS f
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT doc_id, n, rate, f,
      |    LIST_TRANSFORM(RANGE(0, (n + f - 1) // f),
      |      i -> (doc_id * 31 + (i * f) * 17) % 65521 - 32760) AS xs
      |  FROM a)
      |SELECT doc_id, f::BIGINT AS factor,
      |  (rate // f)::BIGINT AS out_rate,
      |  ((n + f - 1) // f)::BIGINT AS out_samples,
      |  ROUND(LIST_SUM(xs)::DOUBLE / ((n + f - 1) // f), 6) AS mean_amp,
      |  LIST_MAX(LIST_TRANSFORM(xs, x -> ABS(x)))::BIGINT AS max_abs
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m11
  /** Audio ACTIVITY segmentation (VAD-style silence trimming) over REAL
    * decoded PCM: each audio doc's planted WAV (the m05 fixture) decodes
    * through javax.sound ([[Multimodal.decodeAudioSamples]]), windows of
    * 16 samples score an integer energy Σ|x|, a window is active iff its
    * mean |x| exceeds 16380 (`energy > 16380·win_len` — no division),
    * and consecutive active windows merge to segments by the
    * gaps-and-islands window (the d10 span pattern). Decode is
    * mapPartitions (binary codec work); everything after is one per-doc
    * window pass. Every quantity is integral, so the oracle regenerates
    * the samples in closed form and replays windows, verdicts, and
    * segment merges exactly. */
  def m11AudioSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    val wins = fanOut(ids).mapPartitions(_.flatMap { id =>
      val n = (50 + id % 30).toInt
      val rate = (8000L * (1 + id % 5)).toInt
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i.toLong * 17) % 65521) - 32760).toShort)
      val dec = Multimodal.decodeAudioSamples(
        Multimodal.pcmWav(rate, samples)).get
      dec.grouped(16).zipWithIndex.map { case (w, wi) =>
        (id, wi.toLong, w.map(s => math.abs(s.toLong)).sum, w.length.toLong)
      }
    }).toDF("doc_id", "win_idx", "energy", "win_len")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_idx"))
    val byStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start_win"))
    wins.filter(col("energy") > lit(16380L) * col("win_len"))
      .withColumn("island", col("win_idx") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("win_idx")).as("start_win"),
        max(col("win_idx")).as("end_win"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("sum_energy"))
      .withColumn("seg_idx",
        (row_number().over(byStart) - 1).cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_win"),
        col("end_win"), col("n_windows"), col("sum_energy"))
      .orderBy("doc_id", "seg_idx")
  }

  val m11Sql: String =
    """WITH a AS (
      |  SELECT doc_id, 50 + doc_id % 30 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (SELECT doc_id, UNNEST(RANGE(0, n)) AS i FROM a),
      |x AS (
      |  SELECT doc_id, i // 16 AS win_idx,
      |    ABS((doc_id * 31 + i * 17) % 65521 - 32760) AS ax
      |  FROM s),
      |wins AS (
      |  SELECT doc_id, win_idx, SUM(ax)::BIGINT AS energy,
      |    COUNT(*)::BIGINT AS win_len
      |  FROM x GROUP BY 1, 2),
      |act AS (
      |  SELECT doc_id, win_idx, energy,
      |    win_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY win_idx)
      |      AS island
      |  FROM wins WHERE energy > 16380 * win_len),
      |seg AS (
      |  SELECT doc_id, island, MIN(win_idx) AS start_win,
      |    MAX(win_idx) AS end_win, COUNT(*) AS n_windows,
      |    SUM(energy)::BIGINT AS sum_energy
      |  FROM act GROUP BY 1, 2)
      |SELECT doc_id,
      |  (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_win) - 1)
      |    ::BIGINT AS seg_idx,
      |  start_win, end_win, n_windows, sum_energy
      |FROM seg ORDER BY doc_id, seg_idx""".stripMargin

  // ---------------------------------------------------------------- m12
  /** CROSS-MODAL retrieval — the multimodal surface composed with the
    * ANN surface, proving the two stacks join: each probe embedding
    * (vec_id < 5, the "text query") retrieves its top-5 IMAGE-modality
    * documents (doc_id % 3 = 0, restricted to ids carrying embeddings)
    * through [[graft.operators.Similarity.knnJoinQuantized]] — s08's
    * integer-banded candidate join, so the retrieval set mirrors exactly
    * — and each hit comes back with its REAL decoded dimensions + 224²
    * fit plan from the planted-PNG header decode path (m03's
    * [[Multimodal.resizeImages]], actual byte parsing in mapPartitions,
    * not id arithmetic on the Spark side; the ORACLE uses the planted
    * arithmetic, which is exactly what the decoder must reproduce).
    *
    * Scale shape: pure composition of pinned pieces — banded ids-only
    * candidate shuffle (s08), one equi-join to re-attach decoded image
    * metadata; the decode runs once over image docs, never per probe. */
  def m12CrossModalRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val imgDocs = docsDf.filter(pmod(col("doc_id"), lit(3)) === 0)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.join(imgDocs.select(col("doc_id").as("__img_id")),
        col("vec_id") === col("__img_id"))
      .select("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") < 5)
    val knn = graft.operators.Similarity.knnJoinQuantized(
      probes, corpus, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, bandBits = 4, bandCount = 8)
    val dims = Multimodal.resizeImages(
      Multimodal.fakeMediaFrame(imgDocs), "doc_id", "payload", "modality",
      targetW = 224, targetH = 224)
      .toDF()
      .select(col("doc_id"),
        col("width").cast("bigint").as("width"),
        col("height").cast("bigint").as("height"),
        col("out_w").cast("bigint").as("out_w"),
        col("out_h").cast("bigint").as("out_h"))
    knn.join(dims, knn("vec_id") === dims("doc_id"))
      .select(col("qid"), col("doc_id"), col("cos"), col("rank"),
        col("width"), col("height"), col("out_w"), col("out_h"))
      .orderBy("qid", "rank")
  }

  /** s08's integer-bucket candidate mirror restricted to image-modality
    * corpus ids, plus m03's planted-header fit arithmetic. */
  val m12Sql: String =
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
      |img AS (
      |  SELECT e.vec_id
      |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      |  WHERE d.doc_id % 3 = 0),
      |cand AS (
      |  SELECT DISTINCT qb.vec_id AS qid, cb.vec_id
      |  FROM bk qb
      |  JOIN bk cb ON cb.band = qb.band AND cb.bucket = qb.bucket
      |  JOIN img ON img.vec_id = cb.vec_id
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
      |  SELECT qid, vec_id AS doc_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored),
      |dims AS (
      |  SELECT doc_id,
      |    (16 + doc_id % 624)::BIGINT AS w,
      |    (16 + doc_id % 464)::BIGINT AS h
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT r.qid, r.doc_id, r.cos, r.rank, d.w AS width, d.h AS height,
      |  (CASE WHEN d.w <= 224 AND d.h <= 224 THEN d.w
      |        WHEN d.w * 224 <= d.h * 224 THEN GREATEST(1, (d.w * 224) // d.h)
      |        ELSE 224 END)::BIGINT AS out_w,
      |  (CASE WHEN d.w <= 224 AND d.h <= 224 THEN d.h
      |        WHEN d.w * 224 <= d.h * 224 THEN 224
      |        ELSE GREATEST(1, (d.h * 224) // d.w) END)::BIGINT AS out_h
      |FROM ranked r JOIN dims d USING (doc_id)
      |WHERE r.rank <= 5
      |ORDER BY r.qid, r.rank""".stripMargin

  // ---------------------------------------------------------------- m13
  /** AUDIO perceptual-fingerprint near-dup join — the audio twin of
    * m10's image dHash banding, closing the modality triangle
    * (text: d02/d03, image: m10, audio: here). Each audio doc's planted
    * WAV decodes through the REAL javax.sound path
    * ([[Multimodal.decodeAudioSamples]]); 64 windows of 8 samples score
    * integer energies, and the fingerprint is the Haitsma-Kalker-style
    * 63-bit energy-delta sign vector (bit w = E_w > E_{w-1}) — invariant
    * to volume scaling by construction, which is exactly what the
    * planted near-dups test: every 10th audio doc reappears at id+10⁶
    * with samples scaled ×7/10 (truncating), perturbing each window
    * energy by ≤ 8 so only near-tie delta bits flip.
    *
    * Scale shape is m10's: corpus collapses to DISTINCT fingerprints
    * first (volume-exact dups merge with cnt > 1 and never enter the
    * pair join), distinct fps band into 4×16-bit chunks — by pigeonhole
    * any pair within Hamming 3 shares a chunk — so candidates are an
    * equi-join, never fp². All integer ⇒ the oracle replays sample
    * synthesis, truncating scale, energies, bits, banding, and Hamming
    * verdicts exactly. */
  def m13AudioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    // the copy marker travels as an explicit flag (never inferred back
    // from id magnitude — a corpus whose real ids cross the 10⁶ planting
    // offset would otherwise misclassify genuine documents as copies)
    val withCopies = ids.flatMap(id =>
      if (id % 30 == 1) Seq((id, false), (id, true)) else Seq((id, false)))
    val fps = fanOut(withCopies).mapPartitions(_.map { case (base, isCopy) =>
      val id = if (isCopy) base + 1000000L else base
      // per-window amplitude modulation keyed by doc id: window energies
      // form a doc-specific profile, so delta-sign fingerprints genuinely
      // differ across docs (a bare sawtooth's deltas are doc-invariant)
      val raw = Array.tabulate(512) { i =>
        val carrier = ((base * 31 + i.toLong * 17) % 65521) - 32760
        (carrier / 5) *
          (1 + ((base * 2654435761L + (i / 8).toLong * 40503L) % 8191) % 5)
      }
      val vals =
        if (isCopy)
          raw.zipWithIndex.map { case (v, i) =>
            if (i / 8 == 29) 0L else (v * 7) / 10 // one dropped frame
          }
        else raw
      val dec = Multimodal.decodeAudioSamples(
        Multimodal.pcmWav(8000, vals.map(_.toShort))).get
      val e = dec.grouped(8).map(_.map(s => math.abs(s.toLong)).sum).toArray
      var fp = 0L
      var w = 1
      while (w < 64) {
        if (e(w) > e(w - 1)) fp |= 1L << (w - 1)
        w += 1
      }
      (id, fp)
    }).toDF("doc_id", "fp")
    val grp = fps.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt"))
    val chunked = grp.select(col("rep"), col("fp"), col("cnt"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("fp"), 16 * c).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "cval")))
    val l = chunked.select(col("rep").as("rep_a"), col("fp").as("fp_a"),
      col("cnt").as("cnt_a"), col("chunk"), col("cval"))
    val r = chunked.select(col("rep").as("rep_b"), col("fp").as("fp_b"),
      col("cnt").as("cnt_b"), col("chunk"), col("cval"))
    l.join(r, Seq("chunk", "cval"))
      .filter(col("rep_a") < col("rep_b"))
      .dropDuplicates("rep_a", "rep_b")
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("rep_a"), col("rep_b"), col("hamming"), col("cnt_a"),
        col("cnt_b"))
      .orderBy("rep_a", "rep_b")
  }

  val m13Sql: String =
    """WITH audio AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
      |corpus AS (
      |  SELECT doc_id, doc_id AS base, FALSE AS scaled FROM audio
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, TRUE FROM audio
      |  WHERE doc_id % 30 = 1),
      |sam AS (
      |  SELECT c.doc_id, g.i,
      |    CASE WHEN c.scaled AND g.i // 8 = 29 THEN 0
      |      WHEN c.scaled THEN
      |        ((((c.base * 31 + g.i * 17) % 65521 - 32760) // 5)
      |         * (1 + ((c.base * 2654435761 + (g.i // 8) * 40503) % 8191) % 5)
      |         * 7) // 10
      |      ELSE (((c.base * 31 + g.i * 17) % 65521 - 32760) // 5)
      |           * (1 + ((c.base * 2654435761 + (g.i // 8) * 40503) % 8191) % 5)
      |      END AS x
      |  FROM corpus c CROSS JOIN (SELECT UNNEST(RANGE(0, 512)) AS i) g),
      |wins AS (
      |  SELECT doc_id, i // 8 AS w, SUM(ABS(x)) AS e
      |  FROM sam GROUP BY 1, 2),
      |bits AS (
      |  SELECT doc_id, w, e,
      |    LAG(e) OVER (PARTITION BY doc_id ORDER BY w) AS pe
      |  FROM wins),
      |fp AS (
      |  SELECT doc_id,
      |    COALESCE(SUM(CASE WHEN w >= 1 AND e > pe
      |      THEN (CAST(1 AS BIGINT) << (w - 1)::INT) ELSE 0 END), 0)::BIGINT
      |      AS fp
      |  FROM bits GROUP BY 1),
      |grp AS (
      |  SELECT fp, MIN(doc_id) AS rep, COUNT(*) AS cnt FROM fp GROUP BY 1),
      |chunks AS (
      |  SELECT rep, fp, cnt, c.chunk,
      |    (fp >> (16 * c.chunk)::INT) & 65535 AS cval
      |  FROM grp CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS chunk) c),
      |cand AS (
      |  SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b, a.fp AS fa,
      |    b.fp AS fb, a.cnt AS cnt_a, b.cnt AS cnt_b
      |  FROM chunks a
      |  JOIN chunks b ON a.chunk = b.chunk AND a.cval = b.cval
      |    AND a.rep < b.rep)
      |SELECT rep_a, rep_b, bit_count(xor(fa, fb))::BIGINT AS hamming,
      |  cnt_a, cnt_b
      |FROM cand WHERE bit_count(xor(fa, fb)) <= 3
      |ORDER BY rep_a, rep_b""".stripMargin

  // ---------------------------------------------------------------- m14
  /** Shot-boundary SEGMENTATION — the grouping stage video curation runs
    * right after m09's keyframe detection: every keyframe opens a new
    * shot, the shot id is a running sum of the boundary flags within the
    * video, and each shot rolls up to (first frame, last frame, length).
    * Built by COMPOSING m09's real-decode keyframe stream (ImageIO PNG
    * decode → dHash64 → per-video lag window) with one more per-video
    * running-sum window and a fixed-width (video, shot) aggregation —
    * no re-decode, no extra scan of the frame payloads. At 100 TB the
    * windows stay per-video (frames per video are bounded by the
    * container format), and the rollup partial-aggregates map-side. The
    * oracle replays m09's closed-form dHash mirror plus the same running
    * sum. */
  def m14ShotSegments(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    m09Keyframes(spark, dir)
      .withColumn("shot_id", sum(col("keyframe").cast("long")).over(w))
      .groupBy(col("doc_id"), col("shot_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .orderBy(col("doc_id"), col("shot_id"))
  }

  val m14Sql: String =
    s"""WITH base AS (
       |${m09Sql}
       |),
       |shots AS (
       |  SELECT doc_id, frame_idx,
       |    (SUM(keyframe::BIGINT) OVER (PARTITION BY doc_id
       |      ORDER BY frame_idx))::BIGINT AS shot_id
       |  FROM base)
       |SELECT doc_id, shot_id,
       |  MIN(frame_idx)::BIGINT AS start_frame,
       |  MAX(frame_idx)::BIGINT AS end_frame,
       |  COUNT(*)::BIGINT AS n_frames
       |FROM shots GROUP BY doc_id, shot_id
       |ORDER BY doc_id, shot_id""".stripMargin

  // ---------------------------------------------------------------- m15
  /** PNG container-format audit ([[Multimodal.pngChunks]]): every image
    * doc is encoded as a REAL PNG (hand-rolled gray codec, any-viewer-decodable) at doc-derived dimensions,
    * then the raw bytes are chunk-walked back — length/type/CRC32 per
    * chunk, IHDR dimensions re-parsed from the binary — the trust-but-
    * verify parse an ingestion pipeline runs before decoding third-party
    * payloads. The IDAT payload length is deflate-implementation-defined
    * and deliberately NOT on the hashed surface; the chunk SEQUENCE, the
    * parsed IHDR dimensions (mirroring the synthesis formula), and the
    * all-CRCs-valid contract are. Binary codec work is mapPartitions
    * (the m06/m09 discipline). */
  def m15PngChunkAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val imgs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    fanOut(imgs).mapPartitions(_.map { id =>
      val w = (9L * (1 + id % 3)).toInt
      val h = (8L * (1 + id % 2)).toInt
      val png = Multimodal.gradientPng(w, h, id)
      val chunks = Multimodal.pngChunks(png)
      val ihdr = chunks.headOption.filter(_._2 == "IHDR").map { _ =>
        val d = png.drop(16) // sig(8) + len(4) + "IHDR"(4)
        val pw = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
          ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        val ph = ((d(4) & 0xff) << 24) | ((d(5) & 0xff) << 16) |
          ((d(6) & 0xff) << 8) | (d(7) & 0xff)
        (pw.toLong, ph.toLong)
      }.getOrElse((-1L, -1L))
      (id, chunks.length.toLong, chunks.map(_._2).mkString(","),
        ihdr._1, ihdr._2, chunks.nonEmpty && chunks.forall(_._4))
    }).toDF("doc_id", "n_chunks", "chunk_seq", "ihdr_w", "ihdr_h",
      "all_crc_ok")
      .orderBy("doc_id")
  }

  val m15Sql: String =
    """SELECT doc_id, 3::BIGINT AS n_chunks,
      |  'IHDR,IDAT,IEND' AS chunk_seq,
      |  (9 * (1 + doc_id % 3))::BIGINT AS ihdr_w,
      |  (8 * (1 + doc_id % 2))::BIGINT AS ihdr_h,
      |  TRUE AS all_crc_ok
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m16
  /** Tile-hash CROP/overlap detection over REAL decoded pixels
    * ([[Multimodal.tileHashes]]): each image-modality doc (doc_id % 7
    * = 0) becomes a genuine gradient PNG (gray = (id + 3x + 7y) mod 256)
    * at 8-divisible dimensions (w = 8·(2 + id mod 3), h = 8·(2 + id
    * mod 2)), decodes back through the hand-rolled PNG codec, and splits into 8×8 tiles
    * whose gray bytes hash via FNV-1a64. Two images sharing ≥ 2 tile
    * contents are sub-image overlaps — the crop/collage signal m07's
    * whole-image dHash cannot see. Per doc the best partner (max shared
    * tiles, min id tiebreak) is reported.
    *
    * 100 TB shape: tiles equi-join on the 8-byte hash — never pixels,
    * never image pairs; the resident side of the join caps per-content
    * membership at the 1000 lowest ids (the d20/StreamingDedup skew
    * discipline — uncapped on this fixture whose largest content class
    * is ≪ 1000, so the oracle sees full semantics; the cap path is
    * spec-pinned). Argmax-partner readout is the two-aggregate
    * max-then-min, both partial-aggregable.
    *
    * Oracle exactness: a tile's 64 gray bytes are fully determined by
    * its origin residue r = (id + 24·tx + 56·ty) mod 256 (within a tile
    * gray = (r + 3i + 7j) mod 256), so tile-content equality ⇔ equal r —
    * the mirror joins on r while the engine joins on the FNV hash of the
    * actual decoded bytes; `TileNeardupSpec` pins hash injectivity over
    * all 256 possible contents, making the two joins provably identical. */
  def m16TileCropNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(7)) === 0)
      .as[Long]
    val tiles = fanOut(ids).mapPartitions(_.flatMap { id =>
      val w = (8 * (2 + id % 3)).toInt
      val h = (8 * (2 + id % 2)).toInt
      Multimodal.tileHashes(Multimodal.gradientPng(w, h, id)).get
        .map { case (_, _, th) => (id, th) }
    }).toDF("doc_id", "thash")
    Multimodal.tileOverlapBestPartner(tiles, bucketCap = 1000,
      minShared = 2L)
      .orderBy("doc_id")
  }

  val m16Sql: String =
    """WITH imgs AS (
      |  SELECT doc_id, 2 + doc_id % 3 AS ntx, 2 + doc_id % 2 AS nty
      |  FROM documents WHERE doc_id % 7 = 0),
      |tiles AS (
      |  SELECT doc_id,
      |    (doc_id + 24 * (p % ntx) + 56 * (p // ntx)) % 256 AS r
      |  FROM (SELECT doc_id, ntx, nty, UNNEST(RANGE(0, ntx * nty)) AS p
      |        FROM imgs)),
      |res AS (
      |  SELECT doc_id AS partner, r FROM (
      |    SELECT doc_id, r,
      |      ROW_NUMBER() OVER (PARTITION BY r ORDER BY doc_id) AS rn
      |    FROM tiles) WHERE rn <= 1000),
      |cand AS (
      |  SELECT t.doc_id, s.partner, COUNT(*)::BIGINT AS shared
      |  FROM tiles t JOIN res s USING (r)
      |  WHERE s.partner <> t.doc_id GROUP BY 1, 2),
      |mx AS (SELECT doc_id, MAX(shared) AS ms FROM cand GROUP BY 1)
      |SELECT c.doc_id, MIN(c.partner) AS partner, m.ms AS shared_tiles
      |FROM cand c JOIN mx m ON m.doc_id = c.doc_id AND c.shared = m.ms
      |WHERE m.ms >= 2
      |GROUP BY c.doc_id, m.ms
      |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------- m17
  /** Image METADATA SCRUB ([[Multimodal.stripAncillaryChunks]]) — the
    * image-side twin of t08's text PII scrub: every PNG (the m15 set)
    * gets a realistic provenance `tEXt` chunk planted (real CRC32, the
    * [[Multimodal.insertTextChunk]] writer), then the scrubber rebuilds
    * the byte stream keeping only critical chunks. The gate proves the
    * rewrite is REAL: chunk counts before/after, exact bytes removed
    * (12-byte chunk framing + "src doc<id>" payload), dimensions
    * re-parsed from the SCRUBBED bytes, and a CRC re-walk of the
    * rebuilt file — all byte-level evidence, all arithmetic the oracle
    * predicts exactly. Per-row mapPartitions codec work, the m06/m09
    * discipline; no shuffle at all until the driver-side orderBy. */
  def m17MetadataScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val w = (9 * (1 + id % 3)).toInt
      val h = (8 * (1 + id % 2)).toInt
      val png = Multimodal.gradientPng(w, h, id)
      val tagged = Multimodal.insertTextChunk(png, "src", s"doc$id")
      val stripped = Multimodal.stripAncillaryChunks(tagged)
      val before = Multimodal.pngChunks(tagged)
      val after = Multimodal.pngChunks(stripped)
      val dims = Multimodal.parsePngHeader(stripped).get
      (id, before.size.toLong, after.size.toLong,
        (tagged.length - stripped.length).toLong,
        dims._1.toLong, dims._2.toLong, after.forall(_._4))
    }).toDF("doc_id", "n_chunks_before", "n_chunks_after",
      "removed_bytes", "w_after", "h_after", "crc_ok_after")
      .orderBy("doc_id")
  }

  val m17Sql: String =
    """SELECT doc_id,
      |  4::BIGINT AS n_chunks_before,
      |  3::BIGINT AS n_chunks_after,
      |  (19 + LENGTH(CAST(doc_id AS VARCHAR)))::BIGINT AS removed_bytes,
      |  (9 * (1 + doc_id % 3))::BIGINT AS w_after,
      |  (8 * (1 + doc_id % 2))::BIGINT AS h_after,
      |  TRUE AS crc_ok_after
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m18
  /** Audio METADATA SCRUB ([[Multimodal.stripWavMetadata]]) — the RIFF
    * twin of m17: each audio-modality doc becomes a REAL PCM WAV
    * (deterministic sawtooth samples), gains a planted `JUNK` annotation
    * chunk (the RIFF-correct metadata write, size field fixed up), and
    * the scrubber rebuilds the container keeping only `fmt ` + `data`.
    * Byte-level proof: chunk counts before/after, exact bytes removed
    * (8-byte frame + "rec<id>" payload + RIFF pad to even), the PCM
    * sample count RE-DECODED from the scrubbed bytes through
    * javax.sound, and a sample-sum equality flag vs the original decode
    * — the samples must survive the rewrite bit-for-bit. */
  def m18AudioScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val samples = Array.tabulate(256)(i =>
        (((id * 31 + i.toLong * 17) % 65521) - 32760).toShort)
      val wav = Multimodal.pcmWav(8000, samples)
      val sum0 = Multimodal.decodeAudioSamples(wav).get
        .foldLeft(0L)(_ + _)
      val tagged = Multimodal.insertWavJunkChunk(wav, s"rec$id")
      val stripped = Multimodal.stripWavMetadata(tagged)
      val decoded = Multimodal.decodeAudioSamples(stripped).get
      (id, Multimodal.wavChunks(tagged).size.toLong,
        Multimodal.wavChunks(stripped).size.toLong,
        (tagged.length - stripped.length).toLong,
        decoded.length.toLong,
        decoded.foldLeft(0L)(_ + _) == sum0)
    }).toDF("doc_id", "n_chunks_before", "n_chunks_after",
      "removed_bytes", "n_samples", "samples_intact")
      .orderBy("doc_id")
  }

  val m18Sql: String =
    """SELECT doc_id,
      |  3::BIGINT AS n_chunks_before,
      |  2::BIGINT AS n_chunks_after,
      |  (8 + LENGTH('rec' || CAST(doc_id AS VARCHAR))
      |     + LENGTH('rec' || CAST(doc_id AS VARCHAR)) % 2)::BIGINT
      |    AS removed_bytes,
      |  256::BIGINT AS n_samples,
      |  TRUE AS samples_intact
      |FROM documents WHERE doc_id % 3 = 2
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m19
  /** Image RESOLUTION-POLICY audit — the LAION-style vision-data gate:
    * drop images whose short side is under 64 px ("too_small", checked
    * first) or whose aspect ratio exceeds 3:1 ("extreme_aspect",
    * integer test 3·min < max — no float ratios), keep the rest. The
    * verdict comes from the DECODED header dimensions (m01's parser),
    * never trusted metadata; the report is one ≤3-row partial agg over
    * the image rows with per-reason dimension envelopes. */
  def m19ResolutionPolicy(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Multimodal.withDecodedMeta(
      Multimodal.fakeMediaFrame(docs), "doc_id", "payload", "modality")
      .toDF()
      .filter(col("modality") === "image")
      .select(col("doc_id"),
        col("width").cast("bigint").as("w"),
        col("height").cast("bigint").as("h"))
      .withColumn("verdict",
        when(least(col("w"), col("h")) < 64, "too_small")
          .when(lit(3) * least(col("w"), col("h")) <
            greatest(col("w"), col("h")), "extreme_aspect")
          .otherwise("ok"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_images"),
        min(col("w")).as("min_w"), max(col("w")).as("max_w"),
        min(col("h")).as("min_h"), max(col("h")).as("max_h"))
      .orderBy("verdict")
  }

  /** m01's planted-header arithmetic (width = 16 + doc_id % 624, height
    * = 16 + doc_id % 464 for image rows) folded through the same
    * integer policy. */
  val m19Sql: String =
    """WITH img AS (
      |  SELECT doc_id,
      |    (16 + doc_id % 624)::BIGINT AS w,
      |    (16 + doc_id % 464)::BIGINT AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |v AS (
      |  SELECT doc_id, w, h,
      |    CASE WHEN LEAST(w, h) < 64 THEN 'too_small'
      |         WHEN 3 * LEAST(w, h) < GREATEST(w, h)
      |           THEN 'extreme_aspect'
      |         ELSE 'ok' END AS verdict
      |  FROM img)
      |SELECT verdict, COUNT(*)::BIGINT AS n_images,
      |  MIN(w) AS min_w, MAX(w) AS max_w,
      |  MIN(h) AS min_h, MAX(h) AS max_h
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- m20
  /** Per-modality STORAGE-BUDGET report — the capacity-planning row a
    * multimodal corpus owner reads: item count, total payload bytes,
    * and the discrete median KiB bucket, computed with q62's
    * histogram-median trick ((modality, KiB) partial agg bounded by the
    * size domain, SQL-standard smallest-bucket-with-2·cum ≥ n rule over
    * the tiny table) — never a per-modality sort of the corpus. */
  def m20StorageBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val meta = Multimodal.withDecodedMeta(
      Multimodal.fakeMediaFrame(docs), "doc_id", "payload", "modality")
      .toDF()
      .select(col("modality"), col("n_bytes").cast("bigint").as("nb"))
    val hist = meta
      .groupBy(col("modality"), expr("nb div 1024").as("kb"))
      .agg(count(lit(1)).as("w"), sum(col("nb")).as("bytes"))
    val cum = Window.partitionBy("modality").orderBy("kb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("modality")
    hist
      .withColumn("cumw", sum(col("w")).over(cum))
      .withColumn("n", sum(col("w")).over(tot))
      .withColumn("total_bytes", sum(col("bytes")).over(tot))
      .filter(col("cumw") * 2 >= col("n"))
      .groupBy(col("modality"))
      .agg(min(col("kb")).as("p50_kb"), max(col("n")).as("n_items"),
        max(col("total_bytes")).as("total_bytes"))
      .select(col("modality"), col("n_items"), col("total_bytes"),
        col("p50_kb"))
      .orderBy("modality")
  }

  /** m01's planted-size arithmetic through the same histogram median. */
  val m20Sql: String =
    """WITH base AS (
      |  SELECT doc_id, COALESCE(STRLEN(text), 0) AS n,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |         ELSE 'video' END AS modality,
      |    doc_id % 6 = 2 AS mp4
      |  FROM documents),
      |sz AS (
      |  SELECT modality,
      |    (CASE modality WHEN 'image' THEN n + 33 WHEN 'audio'
      |          THEN n + 36
      |          ELSE n + CASE WHEN mp4 THEN 300 + 4 * (1 + doc_id % 29)
      |                        ELSE 0 END
      |     END)::BIGINT AS nb
      |  FROM base),
      |hist AS (
      |  SELECT modality, nb // 1024 AS kb, COUNT(*)::BIGINT AS w,
      |    SUM(nb)::BIGINT AS bytes
      |  FROM sz GROUP BY 1, 2),
      |c AS (
      |  SELECT modality, kb, w, bytes,
      |    SUM(w) OVER (PARTITION BY modality ORDER BY kb) AS cumw,
      |    SUM(w) OVER (PARTITION BY modality) AS n,
      |    SUM(bytes) OVER (PARTITION BY modality) AS total_bytes
      |  FROM hist)
      |SELECT modality, MAX(n)::BIGINT AS n_items,
      |  MAX(total_bytes)::BIGINT AS total_bytes,
      |  MIN(kb)::BIGINT AS p50_kb
      |FROM c WHERE cumw * 2 >= n
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- m21
  /** AUDIO CLIPPING CENSUS, real decode: each audio doc becomes a genuine
    * playable WAV whose samples are doc_id-derived — most bounded at
    * |x| ≤ 30000 (safely under the clip threshold), but every position
    * where (doc_id·31 + i·17) mod 11 = 0 is planted at FULL SCALE
    * (alternating +32767 / −32768). The operator decodes the REAL sample
    * stream back via javax.sound ([[Multimodal.decodeAudioSamples]]) and
    * counts samples at ≥ 99% full scale (|x| ≥ 32440) — the standard
    * hot-mastered / damaged-capture detector — then collapses to a
    * per-sample-rate census (≤5 rows; partial agg). The oracle replays
    * the planting arithmetic in list form: any decode drift (byte order,
    * header skew, truncation) moves a planted clip and breaks the hash. */
  def m21AudioClipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    val perDoc = fanOut(ids).mapPartitions(_.map { id =>
      val n = (50 + id % 30).toInt
      val rate = (8000L * (1 + id % 5)).toInt
      val samples = Array.tabulate(n) { i =>
        val k = id * 31 + i.toLong * 17
        if (k % 11 == 0) (if (i % 2 == 0) 32767 else -32768).toShort
        else ((k % 60000) - 30000).toShort
      }
      val decoded = Multimodal.decodeAudioSamples(
        Multimodal.pcmWav(rate, samples)).get
      var clipped = 0L
      var i = 0
      while (i < decoded.length) {
        if (math.abs(decoded(i).toLong) >= 32440L) clipped += 1
        i += 1
      }
      (rate.toLong, decoded.length.toLong, clipped)
    }).toDF("sample_rate", "n_samples", "clipped")
    perDoc.groupBy("sample_rate")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("clipped")).as("n_clipped"),
        sum((col("clipped") > 0).cast("bigint")).as("clipped_docs"))
      .select(col("sample_rate"), col("n_docs"), col("n_samples"),
        col("n_clipped"), col("clipped_docs"),
        expr("""cast((cast(n_clipped as decimal(38,0)) * 1000000)
                 div n_samples as bigint)""").as("clip_micro"))
      .orderBy("sample_rate")
  }

  val m21Sql: String =
    """WITH a AS (
      |  SELECT doc_id, 50 + doc_id % 30 AS n, 8000 * (1 + doc_id % 5) AS rate
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT doc_id, rate, n,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, n),
      |      i -> CASE WHEN (doc_id * 31 + i * 17) % 11 = 0
      |                THEN 1 ELSE 0 END)) AS clipped
      |  FROM a)
      |SELECT rate::BIGINT AS sample_rate,
      |  COUNT(*)::BIGINT AS n_docs,
      |  SUM(n)::BIGINT AS n_samples,
      |  COALESCE(SUM(clipped), 0)::BIGINT AS n_clipped,
      |  SUM(CASE WHEN clipped > 0 THEN 1 ELSE 0 END)::BIGINT AS clipped_docs,
      |  CAST(COALESCE(SUM(clipped), 0)::HUGEINT * 1000000
      |       // SUM(n) AS BIGINT) AS clip_micro
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- m22
  /** AUDIO SILENCE-RUN CENSUS, real decode — the VAD-style audit an
    * audio-curation pipeline runs before paying for transcription: per
    * clip, how many samples sit under the silence threshold (|x| < 1000)
    * and the LONGEST consecutive silent run (a long run means dead air
    * to trim; scattered quiet samples do not). Samples are doc_id-derived
    * with silence planted on a deterministic doc-phase-shifted position
    * pattern (((i+id) div 5) mod 4 = 0 → |x| ≤ 999, else |x| ≥ 2000, so
    * head/tail blocks truncate differently per doc), round-tripped
    * through a REAL javax.sound WAV encode/decode; run lengths are
    * computed in the same per-row pass (row-local, no shuffle). The
    * oracle rebuilds each clip's flag sequence arithmetically and finds
    * the longest run with a gaps-and-islands window — any decode drift
    * breaks a run boundary and the hash. */
  def m22SilenceRuns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .as[Long]
    fanOut(ids).mapPartitions(_.map { id =>
      val n = (50 + id % 30).toInt
      val rate = (8000L * (1 + id % 5)).toInt
      val samples = Array.tabulate(n) { i =>
        val k = id * 31 + i.toLong * 17
        // silence blocks phase-shift with the doc id, so head/tail
        // blocks truncate differently per doc and the run lengths vary
        if (((i + id) / 5) % 4 == 0) ((k % 1999) - 999).toShort
        else {
          val mag = 2000 + (k % 28000)
          (if (i % 2 == 0) mag else -mag).toShort
        }
      }
      val decoded = Multimodal.decodeAudioSamples(
        Multimodal.pcmWav(rate, samples)).get
      var quiet = 0L; var run = 0L; var longest = 0L
      var i = 0
      while (i < decoded.length) {
        if (math.abs(decoded(i).toInt) < 1000) {
          quiet += 1; run += 1
          if (run > longest) longest = run
        } else run = 0
        i += 1
      }
      (id, decoded.length.toLong, quiet, longest)
    }).toDF("doc_id", "n_samples", "n_quiet", "longest_quiet_run")
      .orderBy("doc_id")
  }

  val m22Sql: String =
    """WITH a AS (
      |  SELECT doc_id, 50 + doc_id % 30 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |pos AS (
      |  SELECT doc_id, n, UNNEST(RANGE(0, n)) AS i
      |  FROM a),
      |f AS (
      |  -- planted values make quietness a pure position function:
      |  -- ((i+id) div 5) mod 4 = 0 plants |x| <= 999, every other
      |  -- position plants |x| >= 2000 — strictly across the threshold
      |  SELECT doc_id, n, i,
      |    CASE WHEN ((i + doc_id) // 5) % 4 = 0 THEN 1 ELSE 0 END AS quiet
      |  FROM pos),
      |isl AS (
      |  SELECT doc_id, n, i, quiet,
      |    i - SUM(quiet) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM f),
      |runs AS (
      |  SELECT doc_id, n, grp, COUNT(*)::BIGINT AS run_len
      |  FROM isl WHERE quiet = 1 GROUP BY 1, 2, 3)
      |SELECT a.doc_id, a.n::BIGINT AS n_samples,
      |  COALESCE(q.n_quiet, 0)::BIGINT AS n_quiet,
      |  COALESCE(r.longest, 0)::BIGINT AS longest_quiet_run
      |FROM a
      |LEFT JOIN (SELECT doc_id, SUM(quiet)::BIGINT AS n_quiet
      |           FROM f GROUP BY 1) q USING (doc_id)
      |LEFT JOIN (SELECT doc_id, MAX(run_len) AS longest
      |           FROM runs GROUP BY 1) r USING (doc_id)
      |ORDER BY a.doc_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "m22_silence_runs" -> (m22SilenceRuns _, m22Sql),
    "m21_audio_clipping" -> (m21AudioClipping _, m21Sql),
    "m20_storage_budget" -> (m20StorageBudget _, m20Sql),
    "m19_resolution_policy" -> (m19ResolutionPolicy _, m19Sql),
    "m18_audio_scrub" -> (m18AudioScrub _, m18Sql),
    "m17_metadata_scrub" -> (m17MetadataScrub _, m17Sql),
    "m16_tile_crop_neardup" -> (m16TileCropNeardup _, m16Sql),
    "m15_png_chunk_audit" -> (m15PngChunkAudit _, m15Sql),
    "m14_shot_segments" -> (m14ShotSegments _, m14Sql),
    "m13_audio_fingerprint" -> (m13AudioFingerprint _, m13Sql),
    "m12_crossmodal_retrieval" -> (m12CrossModalRetrieval _, m12Sql),
    "m09_keyframe_select" -> (m09KeyframeSelect _, m09Sql),
    "m11_audio_segments" -> (m11AudioSegments _, m11Sql),
    "m01_multimodal_meta" -> (m01DecodeMeta _, m01Sql),
    "m02_frame_sample" -> (m02FrameSample _, m02Sql),
    "m03_resize" -> (m03Resize _, m03Sql),
    "m04_pixel_stats" -> (m04PixelStats _, m04Sql),
    "m05_audio_stats" -> (m05AudioStats _, m05Sql),
    "m06_real_resize" -> (m06RealResize _, m06Sql),
    "m07_perceptual_hash" -> (m07PerceptualHash _, m07Sql),
    "m08_audio_resample" -> (m08AudioResample _, m08Sql),
    "m10_perceptual_neardup" -> (m10PerceptualNeardup _, m10Sql),
  )
}
