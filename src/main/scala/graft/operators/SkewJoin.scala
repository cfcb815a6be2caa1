package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salting for the case AQE's runtime skew-join
  * can't fix — a hot key so large that even one partition of it overflows
  * an executor.
  *
  * The left (large, skewed) side gets a deterministic salt in [0, factor)
  * derived from hashing its whole row; the right side is replicated
  * `factor` times with every salt value. The join key becomes
  * (key, salt), splitting each hot key into `factor` shuffle partitions.
  * Results are identical to a plain inner join (verified by the spec and
  * the p02 oracle); cost is `factor`× replication of the right side — use
  * for joins where the right side is modest but too big to broadcast.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    val saltCol = "__graft_salt" // unlikely to collide with user columns
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"column $saltCol already exists")
    // deterministic salt: hash of the hashable left columns (Spark's hash()
    // rejects MapType) → stable across task retries
    val hashable = left.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    val salted = left.withColumn(saltCol,
      pmod(hash(hashable: _*), lit(factor)))
    val replicated = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Pre-flight SKEW AUDIT of a join/aggregation key — the one-row
    * report a pipeline runs before choosing between a plain shuffle
    * join, AQE skew handling, and [[saltedInnerJoin]]. At 100 TB the
    * decision can't be eyeballed: a single key holding 2% of a 100 TB
    * table is a 2 TB shuffle partition that no executor survives, and
    * discovering that at stage 40 costs the whole job.
    *
    * One shuffle (the per-key count groupBy, map-side partial), then a
    * tiny exact aggregate over the key summary — the audit is a
    * metadata-scale query no matter the corpus size. All outputs are
    * integers (micro-units for the ratios) so the report mirrors in SQL
    * bit-for-bit:
    *
    *  - `n_keys`, `total_rows`, `max_rows` — the raw census;
    *  - `median_rows` — exact discrete median of the per-key counts;
    *  - `skew_micro` = ⌊10⁶·max/median⌋ — the headline skew factor
    *    (AQE's own skewedPartitionFactor test, key-level);
    *  - `heavy_keys` — keys holding > 10× the median (each a salting
    *    candidate);
    *  - `salt_factor` — ⌈max_rows / target⌉ where target is the mean
    *    rows-per-key: the `factor` that would split the hottest key
    *    into average-sized shuffle units (1 when the key is balanced).
    */
  def skewAudit(df: DataFrame, key: String): DataFrame = {
    // the per-key census feeds two aggregates (the exact median, then the
    // median-relative stats); materialize it once — it is bounded by key
    // cardinality (fixed-width rows), not corpus size
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val med = counts.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)")
        .cast("long").as("median_rows"))
    counts.crossJoin(broadcast(med))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"),
        max(col("cnt")).as("max_rows"),
        max(col("median_rows")).as("median_rows"),
        sum(when(col("cnt") > col("median_rows") * 10L, 1L).otherwise(0L))
          .as("heavy_keys"))
      .select(col("n_keys"), col("total_rows"), col("max_rows"),
        col("median_rows"),
        // ⌊10⁶·max/median⌋ and ⌈max·n_keys/total⌉, both in pure BIGINT
        // arithmetic so any engine reproduces them bit-for-bit
        expr("cast((max_rows * cast(1000000 as bigint)) div median_rows as bigint)")
          .as("skew_micro"),
        col("heavy_keys"),
        expr("""cast((max_rows * n_keys + total_rows - 1) div total_rows
                 as bigint)""").as("salt_factor"))
  }
}
