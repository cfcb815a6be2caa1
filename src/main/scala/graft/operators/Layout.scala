package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how 100 TB gets ARRANGED matters as much as how
  * it is computed — multi-dimensional clustering is what turns min/max
  * file statistics into real data skipping when queries filter on more
  * than one column.
  *
  * Z-order (Morton) curve: interleave the bits of the dimension values so
  * that range-partitioning on the single interleaved key keeps rows close
  * in EVERY dimension within each partition. A query filtering on any
  * clustered dimension then prunes most partitions by their min/max
  * stats, instead of only queries on the leading sort column (the linear
  * `ORDER BY a, b` layout degenerates to a full scan for filters on `b`).
  *
  * The key is pure bit arithmetic over builtin expressions — shifts, and,
  * or — so it rides whole-stage codegen with no UDF and no custom
  * Expression, and the clustering itself is `repartitionByRange` +
  * `sortWithinPartitions`: Spark's own range sampler balances partition
  * sizes even when the z-key distribution is skewed.
  */
object Layout {

  /** `bits`-bit Morton interleave of the given dimension columns (already
    * reduced to `[0, 2^bits)` non-negative longs by the caller — use
    * `pmod`, bucketing, or range scaling). Dimension j's bit i lands at
    * output bit `i * dims + j`, so the result fits `bits * dims` bits;
    * with the 63-bit signed-long budget, `bits * dims <= 62`. */
  def zorderKey(dims: Seq[Column], bits: Int = 10): Column = {
    require(dims.nonEmpty, "zorderKey needs at least one dimension")
    require(bits * dims.size <= 62,
      s"bits=$bits over ${dims.size} dims exceeds the signed-long budget")
    val d = dims.size
    dims.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** The matching ANSI-SQL text for [[zorderKey]] (same unrolled shift/
    * mask arithmetic), for oracle mirrors: pass the SQL of each dimension
    * expression, get the SQL of the interleaved key. */
  def zorderKeySql(dimSql: Seq[String], bits: Int = 10): String = {
    val d = dimSql.size
    dimSql.zipWithIndex.flatMap { case (s, j) =>
      (0 until bits).map(i => s"((((${s}) >> $i) & 1) << ${i * d + j})")
    }.mkString(" | ")
  }

  /** Cluster `df` for multi-dimensional data skipping: range-partition on
    * the z-key (Spark samples the key distribution, so partitions stay
    * balanced under skew) and sort within each partition so row-group
    * min/max stats are tight after a parquet write. The z-key column is
    * kept under the given name for stats/audit; drop it after writing if
    * undesired. */
  def clusterByZOrder(df: DataFrame, dims: Seq[Column], bits: Int = 10,
      numPartitions: Int = 0, keyName: String = "_zkey"): DataFrame = {
    val keyed = df.withColumn(keyName, zorderKey(dims, bits))
    val ranged =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col(keyName))
      else keyed.repartitionByRange(col(keyName))
    ranged.sortWithinPartitions(col(keyName))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment — the shard map
    * an incremental store (d19/d20/s16) keys its partitions by. Each key
    * scores every shard with FNV-1a64("id#shard") and lands on the
    * argmax (first index on the astronomically-unlikely tie), so
    * assignment is stateless, deterministic, and — the property the
    * whole scheme exists for — growing N→N+1 moves ONLY the keys whose
    * new shard wins: nothing ever moves BETWEEN old shards, so a
    * rebalance touches ~1/(N+1) of the data instead of reshuffling
    * everything (Thaler & Ravishankar 1998).
    *
    * Row-local arithmetic (one transform + argmax per key, all inside
    * codegen) — zero shuffle; the score is the repo's mirrorable
    * FNV-1a64 strengthened by the mix64 finalizer (raw FNV's last-byte
    * multiply leaves the HIGH bits — which the argmax compares — too
    * correlated across shard indices: measured 51% of keys landing on
    * the new shard instead of 1/(N+1); the finalizer restores the
    * uniform split), so assignments replay exactly in SQL. */
  def rendezvousShard(df: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val scores = transform(sequence(lit(0), lit(nShards - 1)),
      s => graft.functions.TextExpressions.mix64(
        graft.functions.TextExpressions.fnv1a64(
          concat(col(idCol).cast("string"), lit("#"), s.cast("string")))))
    // the key column passes through under ITS OWN name and type — the
    // score already hashes the string form, so non-numeric keys (UUIDs,
    // URLs) shard correctly; the old cast("long").as("doc_id") silently
    // nulled them into one degenerate shard
    df.select(col(idCol),
      (array_position(scores, array_max(scores)) - 1).cast("long")
        .as("shard"))
  }

  /** Temperature-based source MIXTURE WEIGHTS — the α-temperature
    * sampling rule multilingual pipelines use to keep head sources from
    * drowning the tail (mBERT / XLM-R style, here α = 0.5): a source
    * holding c tokens gets relative weight √c, so a source 100× smaller
    * is sampled only 10× less often.
    *
    * Normalization is to the LARGEST source (its weight is exactly 1.0)
    * rather than to the sum: the max of integer token counts is exact,
    * where a float Σ over an unordered shuffle is not associative-stable
    * — so the whole result is bit-deterministic (integer counts, two
    * correctly-rounded IEEE sqrts, one division, one exact floor-to-
    * micro — never a double ROUND, which half-ulp-flips across engines)
    * and the p27 gate mirrors it in SQL.
    *
    * Scale shape: ONE partial-agg shuffle collapsing the corpus to
    * ≤ |sources| rows; the unpartitioned window after it only ever sees
    * that tiny per-source frame, never corpus-sized data. */
  def temperatureMixture(df: DataFrame, srcCol: String,
      tokCol: Column): DataFrame = {
    val per = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokCol).cast("long").as("tok_count"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    per.select(col("source"), col("n_docs"), col("tok_count"),
      floor(sqrt(col("tok_count").cast("double")) /
        sqrt(max(col("tok_count")).over(all).cast("double")) * 1000000.0)
        .cast("long").as("rel_weight_micro"))
  }

  /** TOKEN-BUDGET data selection — "take the best documents until the
    * budget is spent", the core data-selection primitive of every
    * quality-curated pre-training run: documents ranked (quality DESC,
    * id ASC), selected while the running token total stays ≤ `budget`.
    *
    * The semantics are a global ordered prefix sum, but the PLAN must
    * never globally sort the corpus. Recursive radix selection instead:
    *
    *  1. quality-CLASS histogram (one map-side-combined partial agg,
    *     ≤ |distinct scores| rows) + cumulative window over that tiny
    *     frame → classes fully inside the budget, the boundary class,
    *     and the budget remainder entering it;
    *  2. the SAME move one level down: id-range BUCKET histogram over
    *     only the boundary class (`idCol div bucketWidth`) → buckets
    *     fully inside the remainder, the boundary bucket, remainder 2;
    *  3. an exact per-row window over ONLY the boundary bucket
    *     (≤ bucketWidth ids).
    *
    * Every window runs on histogram-sized or bucket-sized frames; the
    * corpus pays one partial agg and three co-partitioned/broadcast
    * probe joins of tiny threshold frames. The same recursion nests
    * deeper if a single (class, bucket) still overflows memory — each
    * level divides the candidate set by the bucket fan-out.
    *
    * @return the selected rows of `df` (original columns). */
  def budgetSelect(df: DataFrame, idCol: String, qualityCol: Column,
      tokCol: Column, budget: Column, bucketWidth: Long = 64L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("_q", qualityCol)
      .withColumn("_toks", tokCol.cast("long"))
      .localCheckpoint() // feeds the histogram + three probes once
    val bud = base.agg(budget.cast("long").as("_budget"))
    // GLOBAL-WINDOW: bounded — phase 1 quality-class cumulative runs
    // over the groupBy(_q) aggregate: ≤ |distinct scores| rows
    val wq = Window.orderBy(col("_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cls = base.groupBy(col("_q")).agg(sum(col("_toks")).as("_ctoks"))
      .withColumn("_cum", sum(col("_ctoks")).over(wq))
      .crossJoin(broadcast(bud))
    val fullClasses = cls.filter(col("_cum") <= col("_budget"))
      .select(col("_q"))
    // boundary class = highest q whose cumulative overflows the budget
    val boundary = cls.filter(col("_cum") > col("_budget"))
      .orderBy(col("_q").desc).limit(1)
      .select(col("_q").as("_qb"),
        (col("_budget") - (col("_cum") - col("_ctoks"))).as("_rem"))
    // phase 2: id-range buckets inside the boundary class only
    val bdocs = base.crossJoin(broadcast(boundary))
      .filter(col("_q") === col("_qb"))
    // GLOBAL-WINDOW: bounded — ≤ |boundary-class id-range buckets| rows
    // (one groupBy(_bkt) aggregate of a single quality class)
    val wb = Window.orderBy(col("_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bkts = bdocs
      .groupBy(expr(s"`$idCol` div $bucketWidth").as("_bkt"), col("_rem"))
      .agg(sum(col("_toks")).as("_btoks"))
      .withColumn("_bcum", sum(col("_btoks")).over(wb))
    val fullBuckets = bkts.filter(col("_bcum") <= col("_rem"))
      .select(col("_bkt"))
    val bBucket = bkts.filter(col("_bcum") > col("_rem"))
      .orderBy(col("_bkt").asc).limit(1)
      .select(col("_bkt").as("_bb"),
        (col("_rem") - (col("_bcum") - col("_btoks"))).as("_rem2"))
    // phase 3: exact row window over the single boundary bucket
    // GLOBAL-WINDOW: bounded — phase 3 runs inside the SINGLE boundary
    // bucket: ≤ bucketWidth rows by construction
    val wr = Window.orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBoundaryBucket = bdocs.crossJoin(broadcast(bBucket))
      .filter(expr(s"`$idCol` div $bucketWidth") === col("_bb"))
      .withColumn("_rcum", sum(col("_toks")).over(wr))
      .filter(col("_rcum") <= col("_rem2"))
    val keep = df.columns.map(col)
    base.join(broadcast(fullClasses), Seq("_q"), "left_semi")
      .select(keep: _*)
      .unionByName(bdocs
        .join(broadcast(fullBuckets),
          expr(s"`$idCol` div $bucketWidth") === col("_bkt"), "left_semi")
        .select(keep: _*))
      .unionByName(inBoundaryBucket.select(keep: _*))
  }
}
