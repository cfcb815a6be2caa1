package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst extension: plan pure range joins as bucketed equi-joins.
  *
  * A join whose only condition is `l.v BETWEEN r.lo AND r.hi` has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin (fine only when one
  * side broadcasts) or a cartesian product — both fatal at scale. This
  * optimizer rule rewrites the LOGICAL plan into the quantized form
  * [[graft.operators.RangeJoin.bucketed]] builds by hand: the value side
  * gains `floor(v / width)`, the interval side explodes into every bucket
  * it overlaps, the join becomes an ordinary hash join on the bucket id,
  * and the original range predicate is kept as a post-join filter — the
  * result multiset is exactly unchanged (bucket equality is implied by
  * interval membership; null values/bounds fail both forms).
  *
  * Opt-in (it trades interval-width-dependent row duplication for the
  * equi-join): set `spark.graft.rangeJoin.bucketWidth` to a positive
  * width near the median interval length. Registered with
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions` or
  * `GraftSparkExtensions.install(builder)`.
  *
  * The rule is self-stabilizing: its output contains an equality
  * conjunct, which the matcher rejects, so it fires once per join.
  */
object BucketedRangeJoinRule extends Rule[LogicalPlan] {

  final val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def width: Double =
    try conf.getConfString(WidthConf, "0").toDouble
    catch { case _: NumberFormatException => 0.0 }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond, left, right) match {
          case Some((v, lo, hi, valueOnLeft)) =>
            val (valueSide, intervalSide) = if (valueOnLeft) (left, right) else (right, left)

            val bucketOf = (e: Expression) =>
              Floor(Divide(Cast(e, DoubleType), Literal(w)))
            val vBucket = Alias(bucketOf(v), "__graft_bucket_v")()
            val valueProj = Project(valueSide.output :+ vBucket, valueSide)

            // Sequence is TimeZoneAwareExpression: unresolved until a zone
            // is set, even for integral sequences
            val bucketLo = bucketOf(lo)
            val bucketHi = bucketOf(hi)
            val seq = new Sequence(bucketLo, bucketHi,
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
            // Sequence(start, stop, 1) throws on start > stop; an inverted
            // interval (lo > hi) must instead produce zero buckets, matching
            // the original BETWEEN which such a row can never satisfy. A null
            // bound makes the guard null → else branch → zero buckets, which
            // also matches (null bounds fail BETWEEN).
            val guarded = If(LessThanOrEqual(bucketLo, bucketHi), seq,
              Literal.create(Array.empty[Long],
                org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
            val iBucket = AttributeReference("__graft_bucket_i", LongType,
              nullable = false)()
            val intervalGen = Generate(Explode(guarded), Nil, outer = false,
              None, Seq(iBucket), intervalSide)

            val eq = EqualTo(vBucket.toAttribute, iBucket)
            val (newLeft, newRight) =
              if (valueOnLeft) (valueProj, intervalGen) else (intervalGen, valueProj)
            val rewritten = Join(newLeft, newRight, Inner,
              Some(And(eq, cond)), hint)
            Project(j.output, rewritten)
          case None => j
        }
    }
  }

  /** Matches a condition that is EXACTLY two conjuncts bounding one side's
    * numeric value by the other side's [lo, hi] (inclusive, in either
    * written order). Returns (value, lo, hi, valueOnLeft). */
  private def matchRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val cs = conjuncts(cond)
    if (cs.length != 2) return None

    // normalize a conjunct to greater-or-equal form: (big, small)
    def geq(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
    def numeric(e: Expression): Boolean =
      e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]

    // the pattern is (v >= lo) AND (hi >= v): the value appears as the
    // BIG side of one conjunct and the SMALL side of the other
    Seq((cs(0), cs(1)), (cs(1), cs(0))).flatMap { case (c1, c2) =>
      (geq(c1), geq(c2)) match {
        case (Some((v, lo)), Some((hi, v2))) if v.semanticEquals(v2) =>
          Some((v, lo, hi))
        case _ => None
      }
    }.collectFirst {
      case (v, lo, hi)
        if numeric(v) && numeric(lo) && numeric(hi) &&
          sideOf(v, left, right).isDefined &&
          sideOf(lo, left, right).isDefined &&
          sideOf(lo, left, right) == sideOf(hi, left, right) &&
          sideOf(v, left, right) != sideOf(lo, left, right) =>
        (v, lo, hi, sideOf(v, left, right).contains(true))
    }
  }

  /** Some(true) if e references only `left`, Some(false) if only `right`,
    * None if mixed/neither. */
  private def sideOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }
}

/** `spark.sql.extensions` entry point: the optimizer rule AND the SQL
  * function surface — one config line gives a cluster the full library. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BucketedRangeJoinRule)
    graft.functions.GraftFunctions.injectInto(ext)
  }
}
