package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Payloads are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB multimodal corpus uses (bytes in parquet/lance-like
  * files, decode deferred to the last possible stage). Decode / feature
  * extraction runs batched per partition via `Dataset.mapPartitions` (the
  * JVM analogue of `mapInPandas`: one iterator per partition, constant
  * memory, no driver involvement).
  *
  * The actual codec calls are STUBS — this container has no image/audio
  * libraries — marked `// STUB:` below. They produce deterministic fake
  * values derived from the bytes so the plumbing (schema, batch shape,
  * partitioning, null handling) is real and testable end-to-end; swapping
  * in a real decoder changes only the stub body.
  */
object Multimodal {

  /** Input record: id + raw payload + declared modality. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], modality: String)

  /** Decoded metadata + a small feature vector. */
  final case class DecodedRecord(doc_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int,
      features: Array[Float])

  /** STUB: "decode" an image/audio/video payload. Deterministic over bytes:
    * dimensions from simple byte arithmetic, features from a rolling hash.
    * A real deployment would call an actual codec here (and nothing else
    * in this file would change). */
  def decodeStub(payload: Array[Byte], modality: String): (Int, Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val h = graft.functions.GraftHash.fnv1a64(payload)
    val width = 16 + (n % 624)                      // STUB: fake dimensions
    val height = 16 + (n % 464)
    val channels = if (modality == "audio") 1 else 3
    val nFrames = if (modality == "video") 1 + (n % 29) else 1
    val features = Array.tabulate(8) { i =>         // STUB: fake features
      (((h >>> (i * 8)) & 0xff).toFloat / 255.0f) * 2.0f - 1.0f
    }
    (width, height, channels, nFrames, features)
  }

  /** Batched per-partition decode — the `mapInPandas` analogue. */
  def decodeBatch(records: Iterator[MediaRecord]): Iterator[DecodedRecord] =
    records.map { r =>
      // null payload decodes as empty bytes: metadata keeps the stub's
      // floors (width>=16 etc), mirrored by COALESCE in the m01 oracle
      val payload = if (r.payload == null) Array.empty[Byte] else r.payload
      val (w, h, c, f, feat) = decodeStub(payload, r.modality)
      DecodedRecord(r.doc_id, r.modality, payload.length.toLong, w, h, c, f, feat)
    }

  /** Attach decoded metadata to a DataFrame bearing (idCol, binaryCol,
    * modalityCol). Pure narrow transformation — no shuffle. */
  def withDecodedMeta(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String): Dataset[DecodedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(binCol).as("payload"), col(modalityCol).as("modality"))
      .as[MediaRecord]
      .mapPartitions(decodeBatch _)
  }

  /** One sampled frame reference. */
  final case class FrameRef(doc_id: Long, frame_idx: Int, n_frames: Int)

  /** Frame sampling for video payloads: every `stride`-th frame index —
    * flatMap shape (one row in, ceil(n_frames/stride) rows out), batched
    * per partition, no shuffle. The frame COUNT comes from the decode stub;
    * a real implementation would additionally slice the container bytes per
    * emitted index (the row fan-out, schema, and ordering stay the same). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String, stride: Int): Dataset[FrameRef] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(binCol).as("payload"), col(modalityCol).as("modality"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        if (r.modality != "video") Iterator.empty
        else {
          val payload = if (r.payload == null) Array.empty[Byte] else r.payload
          val (_, _, _, nFrames, _) = decodeStub(payload, r.modality)
          (0 until nFrames by stride).iterator
            .map(i => FrameRef(r.doc_id, i, nFrames))
        }
      })
  }

  /** Aspect-preserving fit of (w, h) into (targetW, targetH) in pure
    * integer arithmetic (truncating division — exactly mirrorable in SQL):
    * the side that binds scales to the target, the other scales
    * proportionally. Never upscales. */
  def fitDims(w: Int, h: Int, targetW: Int, targetH: Int): (Int, Int) = {
    if (w <= targetW && h <= targetH) (w, h)
    else if (w.toLong * targetH <= h.toLong * targetW)
      (math.max(1, (w.toLong * targetH / h).toInt), targetH)
    else (targetW, math.max(1, (h.toLong * targetW / w).toInt))
  }

  final case class ResizedRecord(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int)

  /** Resize-to-fit for image payloads — metadata transform driven by the
    * decode stub's dimensions; a real implementation would also re-encode
    * payload bytes per row (batched, narrow, no shuffle — unchanged). */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String, targetW: Int, targetH: Int): Dataset[ResizedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(binCol).as("payload"), col(modalityCol).as("modality"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        if (r.modality != "image") Iterator.empty
        else {
          val payload = if (r.payload == null) Array.empty[Byte] else r.payload
          val (w, h, _, _, _) = decodeStub(payload, r.modality)
          val (ow, oh) = fitDims(w, h, targetW, targetH)
          Iterator.single(ResizedRecord(r.doc_id, w, h, ow, oh))
        }
      })
  }

  /** Deterministic fake corpus: documents' text bytes as payloads with a
    * modality derived from doc_id — exercises the full path on testdata. */
  def fakeMediaFrame(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"))
}
