package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join: for each left row, the single right row with the
  * nearest timestamp at-or-before (backward) / at-or-after (forward) the
  * left row's timestamp, within equal join keys.
  *
  * Spark has no native as-of operator; the naive formulation (equi-join on
  * keys + range predicate + max_by) degenerates to a per-key cross product.
  * This implementation is the scalable union-and-window form: tag both
  * sides, union them, and run ONE window pass per key ordered by
  * (timestamp, tag) carrying the last non-null right payload forward. Cost
  * is a single shuffle + sort of |L|+|R| rows — no quadratic blowup, no
  * per-key iteration, and AQE/skew handling apply as for any window.
  *
  * Matching is INCLUSIVE (a right row at exactly the left timestamp
  * matches — right rows order before left rows at equal timestamps), and
  * the join is INNER: left rows with no qualifying right row are dropped.
  *
  * Contract: `right` must be unique per (keys, rightTs) — pre-aggregate
  * otherwise (the pick among equal-timestamp right rows would be
  * nondeterministic). Non-key right columns must not collide with left
  * column names; rename before calling (e.g. `ts` → `ref_ts`).
  */
object AsOfJoin {

  /** Right row with greatest rightTs <= leftTs per key group.
    * Output: all left columns ++ all non-key right columns. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    asof(left, right, keys, leftTs, rightTs, forward = false)

  /** Right row with smallest rightTs >= leftTs per key group. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    asof(left, right, keys, leftTs, rightTs, forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, forward: Boolean): DataFrame = {
    val lType = left.schema
    val tsType = lType(leftTs).dataType
    require(right.schema(rightTs).dataType == tsType,
      s"as-of timestamp types differ: $leftTs is $tsType, " +
        s"$rightTs is ${right.schema(rightTs).dataType}")
    val rightPayload = right.columns.filterNot(keys.contains)
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")}; " +
        "rename them before the as-of join")
    val reserved = Set("__ts", "__tag", "__l", "__r", "__ref")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"column names ${clash.mkString(", ")} are reserved by the as-of join; rename them")
    val rType = StructType(rightPayload.map(c => right.schema(c)))

    // Null timestamps can never satisfy the as-of predicate (rightTs <=
    // leftTs is null), so drop them up front — matching pandas merge_asof /
    // DuckDB ASOF JOIN. Without this, a null right __ts sorts to the
    // partition head and last(__r, ignoreNulls) would carry it into left
    // rows that have no genuine preceding match.
    val ul = left.filter(col(leftTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__tag"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val ur = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__tag"),
        lit(null).cast(lType).as("__l"),
        struct(rightPayload.toIndexedSeq.map(col): _*).as("__r")): _*)

    // right rows sort before left rows at equal __ts → inclusive match
    val order =
      if (forward) Seq(col("__ts").desc, col("__tag").asc)
      else Seq(col("__ts").asc, col("__tag").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ul.unionByName(ur)
      .withColumn("__ref", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("__ref").isNotNull)
      .select(left.columns.toIndexedSeq.map(c => col("__l").getField(c).as(c)) ++
        rightPayload.map(c => col("__ref").getField(c).as(c)): _*)
  }
}
