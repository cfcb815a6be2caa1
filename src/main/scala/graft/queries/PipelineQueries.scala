package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SkewJoin, TextAnalysis}

/** Composite pipeline queries: the operators working together the way a
  * training-data pipeline composes them. */
object PipelineQueries {

  // ---------------------------------------------------------------- p01
  /** Corpus cleaning: exact-dedup → quality gate → per-language accounting.
    * The full pass a pretraining pipeline runs first on raw text. */
  def p01CorpusClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // canonical doc per identical text (lowest doc_id), via a FIXED-WIDTH
    // shuffle: aggregate min(doc_id) per md5 fingerprint (16 bytes + id
    // move, never the document bodies — same md5-equals-text equivalence
    // the d01 oracle uses), then semi-join the survivors back. Quality is
    // scored only on canonical rows, after the dedup — not on the copies.
    val withFp = docs.withColumn("fp", md5(col("text").cast("binary")))
    val canonIds = withFp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val canon = docs
      .join(canonIds, Seq("doc_id"), "left_semi")
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      // nondeterministic barrier: stops the optimizer from inlining the
      // (large) quality tree into both the pushed filter and the aggregate,
      // which doubled codegen size and dominated cold-run Janino time;
      // results are unaffected (column dropped, aggregates don't touch it)
      .withColumn("__barrier", monotonically_increasing_id())
      .filter(col("quality") >= 0.5)
    // avg as exact-decimal sum / count: double avg is partition-order
    // dependent and would flake the oracle hash
    canon.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(sum(col("quality").cast("decimal(8,4)")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_quality"))
      .orderBy(col("lang"))
  }

  val p01Sql: String =
    """WITH base AS (
      |  SELECT doc_id, lang, text,
      |    STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS w,
      |    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
      |         ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS n_tok,
      |    CASE WHEN LENGTH(text) = 0 THEN 0.0
      |         ELSE (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\p{L}\p{N}\s]', '', 'g')))::DOUBLE
      |              / LENGTH(text)::DOUBLE END AS pr,
      |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rk
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang, n_tok,
      |    ROUND(
      |      (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END) * 0.4
      |      + (1.0 - LEAST(pr * 5.0, 1.0)) * 0.3
      |      + (CASE WHEN (CASE WHEN LEN(w) = 0 THEN 0.0
      |                    ELSE LENGTH(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', '', 'g'))::DOUBLE / LEN(w)::DOUBLE END)
      |              BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.3,
      |      4) AS quality
      |  FROM base WHERE rk = 1)
      |SELECT lang, COUNT(*) AS n_docs, SUM(n_tok)::BIGINT AS total_tokens,
      |  ROUND(CAST(SUM(CAST(quality AS DECIMAL(8,4))) AS DOUBLE)
      |        / COUNT(*)::DOUBLE, 4) AS avg_quality
      |FROM scored WHERE quality >= 0.5
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- p02
  /** Salted join on a genuinely skewed key (events.event_type has ~5
    * values): result must equal the plain join — the oracle is the plain
    * SQL join, so the salting's correctness is hash-checked. */
  def p02SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val typeStats = events.groupBy(col("event_type"))
      .agg(round(sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double"), 4).as("type_avg"))
    val joined = SkewJoin.saltedInnerJoin(
      events.select(col("event_id"), col("event_type"), col("value")),
      typeStats, "event_type", factor = 8)
    joined.select(col("event_id"), col("event_type"),
      round(col("value") - col("type_avg"), 4).as("value_vs_type_avg"))
      .orderBy(col("event_id"))
  }

  val p02Sql: String =
    """WITH stats AS (
      |  SELECT event_type,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |          / COUNT(*)::DOUBLE, 4) AS type_avg
      |  FROM events GROUP BY event_type)
      |SELECT event_id, event_type,
      |  ROUND(value - type_avg, 4) AS value_vs_type_avg
      |FROM events JOIN stats USING (event_type)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- p03
  /** Deterministic stratified sampling: up to 40 docs per language, chosen
    * by md5-hash order — the reproducible subsampling a training pipeline
    * uses to build balanced mixes (same inputs → same sample, on any
    * cluster, in any engine; no RNG state). One window shuffle; at scale
    * the rank cut prunes everything else before any payload moves. */
  def p03StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val byLangHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rk", row_number().over(byLangHash))
      .filter(col("rk") <= 40)
      .select(col("doc_id"), col("lang"), col("rk").cast("bigint").as("rk"))
      .orderBy(col("doc_id"))
  }

  val p03Sql: String =
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY MD5(text), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, lang, rk::BIGINT AS rk
      |FROM ranked WHERE rk <= 40 ORDER BY doc_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "p01_corpus_clean" -> (p01CorpusClean _, p01Sql),
    "p02_salted_join" -> (p02SaltedJoin _, p02Sql),
    "p03_stratified_sample" -> (p03StratifiedSample _, p03Sql),
  )
}
