package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing ("sample packing"): assemble documents into
  * fixed-token-budget training sequences with a greedy next-fit pass —
  * the step between a cleaned corpus and a trainer's sequence loader.
  *
  * True global next-fit is a sequential recurrence (each bin boundary
  * depends on every prior document), so it cannot be distributed as-is.
  * The scalable form — and what real pipelines run — is LOCAL packing:
  * here, packing is confined to deterministic buckets of `bucketSize`
  * consecutive doc ids, so every bucket packs independently and in
  * parallel (one shuffle on the bucket key), results are byte-identical
  * across runs and cluster layouts (unlike partition-local packing, which
  * depends on the physical partitioning), and waste is bounded: at most
  * one under-filled final bin per bucket.
  *
  * The per-bucket recurrence itself is a declarative `aggregate` fold
  * over the bucket's (id-sorted) documents — accumulator carries
  * (fill, bin, per-doc bin trace) — no UDF, no mapPartitions, fully
  * Catalyst-visible. Fold cost is O(bucketSize²) array-copy in the trace;
  * `bucketSize` is the knob that bounds it.
  *
  * A document longer than the budget gets a bin of its own (the trainer
  * truncates or chunks it downstream — standard next-fit behavior).
  */
object Packing {

  /** @return (doc_id, bucket, bin, n_tokens): `bin` is the sequence index
    *         within `bucket`; (bucket, bin) is the global sequence key. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int = 512, bucketSize: Int = 100): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    val toks = df.select(col(idCol).cast("bigint").as("doc_id"),
      coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L)).as("t"),
      expr(s"CAST($idCol AS BIGINT) div $bucketSize").as("bucket"))
    val grouped = toks.groupBy("bucket")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("t")))).as("ds"))
    val folded = grouped.withColumn("bins", expr(
      s"""aggregate(
         |  ds,
         |  named_struct('fill', CAST(0 AS BIGINT), 'bin', CAST(0 AS BIGINT),
         |               'bins', CAST(array() AS ARRAY<BIGINT>)),
         |  (acc, d) -> named_struct(
         |    'fill', CASE WHEN acc.fill > 0 AND acc.fill + d.t > $budget
         |                 THEN d.t ELSE acc.fill + d.t END,
         |    'bin', CASE WHEN acc.fill > 0 AND acc.fill + d.t > $budget
         |                THEN acc.bin + 1 ELSE acc.bin END,
         |    'bins', array_append(acc.bins,
         |      CASE WHEN acc.fill > 0 AND acc.fill + d.t > $budget
         |           THEN acc.bin + 1 ELSE acc.bin END)),
         |  acc -> acc.bins)""".stripMargin))
    folded
      .select(col("bucket"), posexplode(arrays_zip(col("ds"), col("bins")))
        .as(Seq("i", "z")))
      .select(col("z.ds.doc_id").as("doc_id"), col("bucket"),
        col("z.bins").as("bin"), col("z.ds.t").as("n_tokens"))
  }
}
