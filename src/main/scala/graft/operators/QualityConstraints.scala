package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/
  * great-expectations shape): a suite of table constraints evaluates to
  * one (check_name, metric, passed) verdict row each, so a pipeline can
  * gate a publish step on `min(passed)`.
  *
  * Scale shape: all row-local constraints (completeness, bounds,
  * pattern conformance) fold into ONE aggregation pass over the table —
  * a single scan, map-side partial aggs, |constraints| output rows.
  * Uniqueness adds the one distinct shuffle it inherently needs;
  * referential containment is a broadcast left-anti probe against the
  * (small) referenced key set. Nothing ever collects more than the
  * verdict rows.
  *
  * Metrics are integral micro-fractions (`metric_micro` =
  * ⌊10⁶·fraction⌋, integer division) so verdicts and metrics mirror
  * exactly in any engine. */
object QualityConstraints {

  sealed trait Constraint { def name: String }
  /** Fraction of non-null values in `col` ≥ minFrac. */
  case class Complete(name: String, col: String, minFracMicro: Long)
    extends Constraint
  /** All non-null values within [lo, hi]. */
  case class Bounded(name: String, col: String, lo: Double, hi: Double)
    extends Constraint
  /** Fraction of non-null values matching the regex ≥ minFrac. */
  case class Pattern(name: String, col: String, regex: String,
    minFracMicro: Long) extends Constraint
  /** distinct(col) == count(col) — key uniqueness. */
  case class Unique(name: String, col: String) extends Constraint
  /** Every non-null value of `col` exists in `refDf.refCol` (FK). */
  case class ContainedIn(name: String, col: String, refDf: DataFrame,
    refCol: String) extends Constraint

  /** Evaluate the suite. @return (check_name, metric_micro, passed),
    * one row per constraint, ordered by constraint name. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    val n = count(lit(1))
    // one aggregation row carrying every row-local metric + the distinct
    // counts uniqueness needs (Spark plans multi-distinct in one pass)
    val aggCols: Seq[Column] = constraints.zipWithIndex.flatMap {
      case (Complete(_, c, _), i) =>
        Seq(sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"m$i"),
          n.as(s"d$i"))
      case (Bounded(_, c, lo, hi), i) =>
        Seq(sum(when(col(c).isNotNull &&
            (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
          .as(s"m$i"), n.as(s"d$i"))
      case (Pattern(_, c, re, _), i) =>
        Seq(sum(when(col(c).isNotNull && col(c).rlike(re), 1L).otherwise(0L))
          .as(s"m$i"),
          sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"d$i"))
      case (Unique(_, c), i) =>
        Seq(countDistinct(col(c)).as(s"m$i"),
          sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"d$i"))
      case (_: ContainedIn, i) =>
        Seq(lit(0L).as(s"m$i"), lit(0L).as(s"d$i")) // computed separately
    }
    val aggRow = df.agg(aggCols.head, aggCols.tail: _*)

    val verdicts: Seq[DataFrame] = constraints.zipWithIndex.map {
      case (Complete(name, _, minMicro), i) =>
        aggRow.select(lit(name).as("check_name"),
          expr(s"(m$i * 1000000) div d$i").as("metric_micro"))
          .withColumn("passed", col("metric_micro") >= minMicro)
      case (Bounded(name, _, _, _), i) =>
        // metric = violation count (not a fraction): pass iff zero
        aggRow.select(lit(name).as("check_name"),
          col(s"m$i").as("metric_micro"))
          .withColumn("passed", col("metric_micro") === 0L)
      case (Pattern(name, _, _, minMicro), i) =>
        aggRow.select(lit(name).as("check_name"),
          expr(s"(m$i * 1000000) div d$i").as("metric_micro"))
          .withColumn("passed", col("metric_micro") >= minMicro)
      case (Unique(name, _), i) =>
        aggRow.select(lit(name).as("check_name"),
          expr(s"(m$i * 1000000) div d$i").as("metric_micro"),
          (col(s"m$i") === col(s"d$i")).as("passed"))
      case (ContainedIn(name, c, refDf, refCol), _) =>
        val orphans = df.select(col(c)).filter(col(c).isNotNull)
          .join(broadcast(refDf.select(col(refCol).as(c)).distinct()),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as("metric_micro"))
        orphans.select(lit(name).as("check_name"), col("metric_micro"))
          .withColumn("passed", col("metric_micro") === 0L)
    }
    verdicts.reduce(_.unionByName(_)).orderBy(col("check_name"))
  }
}
