package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Model-based quality filtering — the fastText-style linear classifier
  * step modern training-data pipelines run after rule-based filters
  * (cf. the reference pipeline families; DCLM / LLaMA-class recipes score
  * every document with a cheap linear model and keep the top fraction).
  *
  * The implementation is the hashing-trick inference path, end to end:
  *
  *  1. feature extraction — unigrams + bigrams hashed into `dim` buckets
  *     (FNV-1a64, the repo's codegen expression, so the oracle can mirror
  *     the bucket assignment bit-for-bit);
  *  2. sparse aggregation — one groupBy(doc, bucket) count, partial-
  *     aggregated map-side, the shuffle carries fixed-width
  *     (id, int, long) rows, never text;
  *  3. inference — an equi-join of the feature rows against a `dim`-row
  *     weight TABLE (broadcast; a real pipeline loads trained weights the
  *     same way), then sum(count × weight) per document.
  *
  * Everything is integer arithmetic, so the DuckDB oracle reproduces
  * logits exactly — no float tolerance anywhere. The weight table here is
  * a deterministic frozen stand-in (Knuth multiplicative hash of the
  * bucket id mapped to [-8, 8]); swapping in trained weights changes one
  * DataFrame, not the plan.
  *
  * At 100 TB: the only shuffle is the (id, bucket) partial-agg; the
  * weight join is a broadcast (`dim` rows) and the final logit is a
  * second fixed-width partial agg keyed by id. No skew guard is needed —
  * a hot token inflates ONE (id, bucket) count, not a join fan-out.
  */
object QualityClassifier {

  /** Hashed bag-of-ngrams: one row per (id, bucket) with its term count.
    * `dim` must be a power of two ≤ 2³¹ so that signed-vs-unsigned FNV
    * residues agree across engines (2⁶⁴ ≡ 0 mod dim). */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of 2: $dim")
    // tokenize ONCE per row: the generator expression below references the
    // token array four times (unigrams + three times building bigrams), and
    // nothing de-duplicates a repeated split chain inside one Generate —
    // bind it to a column first
    val toks = col("__toks")
    // bigrams via zip-with-shifted-self; the trailing (last, null) pair
    // nulls out and array_compact drops it — no branch on size
    val bigrams = array_compact(zip_with(
      toks, slice(toks, lit(2), size(toks)),
      (a, b) => when(b.isNotNull, concat(a, lit(" "), b))))
    df.filter(trim(col(textCol)) =!= "")
      .withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))
      .select(col(idCol), explode(concat(toks, bigrams)).as("gram"))
      .select(col(idCol),
        pmod(TextExpressions.fnv1a64(col("gram")), lit(dim.toLong))
          .cast("int").as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Deterministic frozen weight table (bucket, weight ∈ [-8, 8]) — the
    * stand-in for trained coefficients; integer-exact in any engine. */
  def weightTable(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim.toLong).select(
      col("id").cast("int").as("bucket"),
      (col("id") * lit(2654435761L) % lit(4294967296L) % lit(17) - lit(8))
        .as("weight"))

  /** Score every document: (id, n_features, logit, keep). `bias` shifts
    * the decision threshold (logit + bias > 0). */
  def score(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 4096, bias: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    hashedFeatures(df, idCol, textCol, dim)
      .join(broadcast(weightTable(spark, dim)), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        (sum(col("cnt") * col("weight")) + lit(bias)).as("logit"))
      .withColumn("keep", col("logit") > 0)
  }
}
