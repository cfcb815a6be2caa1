package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.GraftHash

/** Count–min sketch frequency estimation as a typed [[Aggregator]].
  *
  * The sketch is a depth×width counter matrix; `reduce` increments one
  * counter per hash row, `merge` is element-wise addition — commutative
  * and associative, so the aggregated sketch (and every estimate read from
  * it) is deterministic under any partitioning, and map-side partial
  * aggregation applies: executors combine local sketches and shuffle
  * depth×width longs once per partition, never per row. Estimates are
  * upper bounds (min over rows ≥ true count; never an underestimate).
  *
  * This is the training-pipeline shape for frequency capping / hot-key
  * detection at 100 TB: the data is seen once, only fixed-size sketches
  * move, and per-key queries are O(depth) driver-side lookups.
  */
object HeavyHitters {

  /** Hash of `s` for sketch row `d` (seeded FNV-1a + splitmix finalizer —
    * same mixing discipline as the LSH hyperplanes). */
  private[graft] def rowIndex(s: String, d: Int, width: Int, seed: Long): Int = {
    val h = GraftHash.mix64(
      GraftHash.fnv1a64Seeded(s.getBytes("UTF-8"), seed) ^
        (d + 1) * 0x9e3779b97f4a7c15L)
    java.lang.Math.floorMod(h, width.toLong).toInt
  }

  class CountMinAggregator(depth: Int, width: Int, seed: Long)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0, "depth and width must be positive")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        var d = 0
        while (d < depth) {
          buf(d * width + rowIndex(key, d, width, seed)) += 1L
          d += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate for one key: min counter across rows. */
  def estimate(sketch: Array[Long], key: String, depth: Int, width: Int,
      seed: Long): Long = {
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + rowIndex(key, d, width, seed))
      if (c < min) min = c
      d += 1
    }
    min
  }

  /** Exact and sketch-estimated counts per distinct value of `keyCol`.
    * Null keys are excluded (the sketch cannot count them — `reduce`
    * skips nulls — so reporting them exact-only would be misleading).
    *
    * The sketch aggregation is fully distributed (one pass, partial
    * combine); the per-key estimate lookup collects the distinct keys —
    * bounded by `maxKeys` (heavy-hitter reports are by definition over few
    * keys; raise the bound consciously, don't stream millions of keys
    * through the driver). */
  def keyFrequencies(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 8192, seed: Long = 42L, maxKeys: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val sketch = keys.as[String]
      .select(new CountMinAggregator(depth, width, seed).toColumn)
      .head()
    val exact = keys.groupBy(col("key")).agg(count(lit(1)).as("exact_count"))
    val distinctKeys = exact.select(col("key")).limit(maxKeys + 1)
      .collect().map(_.getString(0))
    require(distinctKeys.length <= maxKeys,
      s"more than $maxKeys distinct keys in '$keyCol'; " +
        "heavy-hitter reporting expects a bounded key set")
    val estimates = distinctKeys.toSeq
      .map(k => (k, estimate(sketch, k, depth, width, seed)))
      .toDF("key", "est_count")
    exact.join(broadcast(estimates), Seq("key"))
  }
}
