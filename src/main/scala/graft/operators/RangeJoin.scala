package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: left rows against right [lo, hi] intervals with
  * `left.value BETWEEN right.lo AND right.hi` (inclusive both ends).
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin (fine only
  * when one side broadcasts) or a cartesian product. [[bucketed]] is the
  * standard scalable rewrite: quantize the value domain into fixed-width
  * buckets, assign each left row its single bucket, explode each right
  * interval into every bucket it overlaps, equi-join on the bucket id, and
  * re-apply the exact range predicate. Both sides shuffle on a dense
  * integer key, so the join is an ordinary hash join whose cost scales with
  * |L| + Σ interval-widths/bucketWidth instead of |L|·|R|; Catalyst still
  * broadcasts the exploded side when it is small.
  *
  * `bucketWidth` trades duplication for selectivity: wider buckets explode
  * fewer rows per interval but match more non-qualifying pairs for the
  * re-filter to drop. Pick it near the median interval width.
  */
object RangeJoin {

  /** Inner bucketed range join; output = left columns ++ right columns. */
  def bucketed(left: DataFrame, right: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val lb = left.withColumn("__bucket", floor(col(valueCol) / bucketWidth))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }
}
