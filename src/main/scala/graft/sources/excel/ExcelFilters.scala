package graft.sources.excel

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Filter evaluation inside the excel scan.
  *
  * xlsx must be decompressed and parsed regardless (SURVEY §4), so pushdown
  * here cannot skip IO — what it skips is per-row conversion to Catalyst
  * values and everything downstream of the scan. Supported predicates are
  * evaluated on the decoded cell values; unsupported ones are left entirely
  * to Spark. All accepted filters are ALSO reported back as post-scan
  * filters, so Spark re-applies them — double evaluation of a cheap
  * predicate is the price of a simpler correctness argument.
  */
object ExcelFilters {

  /** Can this filter be evaluated by [[evaluate]]? */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case StringStartsWith(a, _) => schema.fieldNames.contains(a)
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case Not(c) => supported(c, schema)
    case _ => false
  }

  /** Evaluate on a converted Catalyst row value lookup (by field name →
    * Catalyst value: UTF8String / Int / Long / Double / Boolean; Date as
    * epoch-day Int, Timestamp as micros Long). */
  def evaluate(f: Filter, schema: StructType,
      value: String => Any): Boolean = f match {
    case EqualTo(a, v) => compare(a, v, schema, value).contains(0)
    case GreaterThan(a, v) => compare(a, v, schema, value).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => compare(a, v, schema, value).exists(_ >= 0)
    case LessThan(a, v) => compare(a, v, schema, value).exists(_ < 0)
    case LessThanOrEqual(a, v) => compare(a, v, schema, value).exists(_ <= 0)
    case IsNull(a) => value(a) == null
    case IsNotNull(a) => value(a) != null
    case StringStartsWith(a, p) => value(a) match {
      case null => false
      case s => s.toString.startsWith(p)
    }
    case And(l, r) => evaluate(l, schema, value) && evaluate(r, schema, value)
    case Or(l, r) => evaluate(l, schema, value) || evaluate(r, schema, value)
    case Not(c) =>
      // SQL ternary logic: NOT over a null-involving comparison is handled
      // by the comparisons returning false already; plain negation suffices
      // because accepted leaves return false on null (never true-on-null)
      !evaluate(c, schema, value)
    case _ => true
  }

  /** Three-way compare of the row's Catalyst value vs the literal; None
    * when the cell is null (comparisons with null are never true). */
  private def compare(attr: String, lit: Any, schema: StructType,
      value: String => Any): Option[Int] = {
    val v = value(attr)
    if (v == null || lit == null) return None
    schema(attr).dataType match {
      case StringType =>
        Some(v.toString.compareTo(lit.toString))
      case IntegerType | LongType | DoubleType | FloatType =>
        val l = v match {
          case n: java.lang.Number => n.doubleValue()
          case _ => return None
        }
        val r = lit match {
          case n: java.lang.Number => n.doubleValue()
          case _ => return None
        }
        Some(java.lang.Double.compare(l, r))
      case BooleanType => (v, lit) match {
        case (a: java.lang.Boolean, b: java.lang.Boolean) =>
          Some(a.compareTo(b))
        case _ => None
      }
      case DateType =>
        val days = v match { case i: java.lang.Integer => i.intValue(); case _ => return None }
        val litDays = lit match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case d: java.time.LocalDate => d.toEpochDay.toInt
          case _ => return None
        }
        Some(java.lang.Integer.compare(days, litDays))
      case TimestampType =>
        val micros = v match { case l: java.lang.Long => l.longValue(); case _ => return None }
        val litMicros = lit match {
          case t: java.sql.Timestamp =>
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          case t: java.time.Instant =>
            t.getEpochSecond * 1000000L + t.getNano / 1000L
          case _ => return None
        }
        Some(java.lang.Long.compare(micros, litMicros))
      case _ => None
    }
  }
}
