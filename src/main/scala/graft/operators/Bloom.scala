package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter membership — the constant-size pre-filter that
  * makes 100 TB decontamination cheap: the blocklist (eval-set n-grams)
  * compresses to a fixed bit array shipped to every executor, the corpus
  * probes it row-locally, and only the tiny bloom-positive candidate set
  * pays the exact verification join. d09's inverted-index join is exact
  * but shuffles corpus postings; this path never shuffles the corpus at
  * all until the candidates are known.
  *
  * Determinism: the k = 4 probe positions are 16-bit slices of one
  * `md5(gram)` — no seeded RNG, no float — so the filter contents AND
  * the false-positive set are bit-reproducible on any engine; the gate's
  * DuckDB oracle rebuilds the same words and reproduces both counts
  * exactly. The bit array is stored as `m/60`-row (word_idx, bits)
  * pairs — 60-bit words sidestep BIGINT sign-bit shift semantics — and
  * built with a `bit_or` partial aggregation, so construction is one
  * fixed-width shuffle of the blocklist, never the corpus. m = 2^16 here
  * (the gate blocklist is small); production sizing scales m with the
  * blocklist at the usual 10-15 bits/key for ~0.1% FP — still KBs per
  * million keys, comfortably broadcast-able.
  */
object Bloom {

  val MBits = 65536
  val WordBits = 60

  private def explodedPositions(gramCol: String) =
    explode(array((0 until 4).map(i =>
      conv(substring(md5(col(gramCol).cast("binary")), i * 4 + 1, 4), 16, 10)
        .cast("long") % MBits): _*)).as("pos")

  /** (word_idx, bits) rows of the filter over `gramCol` of `grams`. */
  def build(grams: DataFrame, gramCol: String): DataFrame =
    grams
      .select(explodedPositions(gramCol))
      .select(expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("m"))
      .groupBy("word_idx")
      .agg(expr("bit_or(m)").as("bits"))

  /** Distinct (idCol, gramCol) rows of `probe` whose 4 bloom positions
    * are all set in `filter` (built by [[build]]).
    *
    * The filter collapses to a ONE-ROW word_idx→bits map, broadcast to
    * every task, and the whole membership test is a row-local expression
    * — no explode, no join keyed on the corpus, no aggregation. This is
    * the plan shape that matters at 100 TB: the corpus flows through a
    * single narrow stage. (`collect_list` order inside the map build is
    * partition-order-dependent, but map LOOKUP semantics are not — the
    * result is deterministic.) */
  def candidates(probe: DataFrame, idCol: String, gramCol: String,
      filter: DataFrame): DataFrame = {
    val bf = filter.agg(
      map_from_arrays(collect_list(col("word_idx")), collect_list(col("bits")))
        .as("bf"))
    var df = probe
      .select(col(idCol), col(gramCol))
      .distinct()
      .crossJoin(broadcast(bf))
      .withColumn("h", md5(col(gramCol).cast("binary")))
    for (i <- 0 until 4)
      df = df.withColumn(s"pos$i",
        conv(substring(col("h"), i * 4 + 1, 4), 16, 10).cast("long") % MBits)
    val allSet = (0 until 4)
      .map(i => expr(
        s"(shiftright(element_at(bf, pos$i div $WordBits), " +
          s"cast(pos$i % $WordBits as int)) & 1L) = 1L"))
      .reduce(_ && _)
    df.filter(allSet).select(col(idCol), col(gramCol))
  }

  /** Row-local bloom pruning of a FACT stream: every row of `df` whose
    * `keyCol` passes the filter, all other columns untouched. Unlike
    * [[candidates]] there is no distinct and no projection — this is the
    * semi-join-reduction shape: the fact table flows through one narrow
    * filter stage (scan → row-local membership test), rows that cannot
    * match are dropped BEFORE any exchange, and only survivors pay the
    * exact join. No false negatives by construction, so correctness is
    * exactly the downstream join's; false positives only cost work.
    *
    * Keys probe as their canonical string rendering (`CAST(key AS
    * STRING)`), so any engine — and any integral/string key type — folds
    * the same bytes. */
  def prune(df: DataFrame, keyCol: String, filter: DataFrame): DataFrame = {
    val bf = filter.agg(
      map_from_arrays(collect_list(col("word_idx")), collect_list(col("bits")))
        .as("__bf"))
    var out = df.crossJoin(broadcast(bf))
      .withColumn("__h", md5(col(keyCol).cast("string").cast("binary")))
    for (i <- 0 until 4)
      out = out.withColumn(s"__pos$i",
        conv(substring(col("__h"), i * 4 + 1, 4), 16, 10).cast("long") % MBits)
    val allSet = (0 until 4)
      .map(i => expr(
        s"(shiftright(element_at(__bf, __pos$i div $WordBits), " +
          s"cast(__pos$i % $WordBits as int)) & 1L) = 1L"))
      .reduce(_ && _)
    out.filter(allSet)
      .drop("__bf" +: "__h" +: (0 until 4).map(i => s"__pos$i"): _*)
  }

  /** xxhash64 probe positions — the FAST path. The md5 layout above
    * exists to be byte-for-byte mirrorable in an oracle engine; when no
    * mirror is needed (pruning before an exact join, where bloom errors
    * cannot change the answer), four seeded xxhash64 calls stay inside
    * whole-stage codegen with no hex-string materialization, conversion,
    * or substring work per row. Build and probe must agree on the hash —
    * [[buildFast]] pairs with [[pruneFast]] only. */
  private def fastPositions(key: org.apache.spark.sql.Column) =
    (0 until 4).map(i => pmod(xxhash64(lit(i), key), lit(MBits.toLong)))

  /** (word_idx, bits) filter rows over `keyCol`, xxhash64 probes. */
  def buildFast(keys: DataFrame, keyCol: String): DataFrame =
    keys
      .select(explode(array(fastPositions(col(keyCol)): _*)).as("pos"))
      .select(expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("m"))
      .groupBy("word_idx")
      .agg(expr("bit_or(m)").as("bits"))

  /** [[prune]] with xxhash64 probes against a [[buildFast]] filter. */
  def pruneFast(df: DataFrame, keyCol: String, filter: DataFrame): DataFrame = {
    val bf = filter.agg(
      map_from_arrays(collect_list(col("word_idx")), collect_list(col("bits")))
        .as("__bf"))
    var out = df.crossJoin(broadcast(bf))
    val positions = fastPositions(col(keyCol))
    for (i <- 0 until 4)
      out = out.withColumn(s"__pos$i", positions(i))
    val allSet = (0 until 4)
      .map(i => expr(
        s"(shiftright(element_at(__bf, __pos$i div $WordBits), " +
          s"cast(__pos$i % $WordBits as int)) & 1L) = 1L"))
      .reduce(_ && _)
    out.filter(allSet)
      .drop("__bf" +: (0 until 4).map(i => s"__pos$i"): _*)
  }
}
