package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal-plumbing query: documents' bytes as fake payloads through the
  * batched per-partition decode stub ([[Multimodal.decodeBatch]]). The
  * decode is a deterministic STUB (no codecs in this container) whose
  * arithmetic is mirrored in the oracle, so the whole binary→metadata
  * pipeline is hash-checked even though the codec is fake. */
object MultimodalQueries {

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

  val m01Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    COALESCE(STRLEN(text), 0) AS n,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
      |  FROM documents)
      |SELECT doc_id, modality,
      |  n::BIGINT AS n_bytes,
      |  (16 + n % 624)::BIGINT AS width,
      |  (16 + n % 464)::BIGINT AS height,
      |  (CASE WHEN modality = 'audio' THEN 1 ELSE 3 END)::BIGINT AS channels,
      |  (CASE WHEN modality = 'video' THEN 1 + n % 29 ELSE 1 END)::BIGINT AS n_frames
      |FROM base ORDER BY doc_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "m01_multimodal_meta" -> (m01DecodeMeta _, m01Sql),
  )
}
