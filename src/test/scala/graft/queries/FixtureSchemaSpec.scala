package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-generated fixture schemas the gate queries depend on —
  * the generalization of the events.ts lesson (see [[EventTimeSpec]]):
  * when the driver regenerates `/root/testdata` with a different physical
  * spelling, THIS suite names the drift instead of a mid-verify analysis
  * exception. Columns are checked by NAME and type FAMILY (integral /
  * fractional / string / date-or-time), not exact physical type, so
  * benign respellings (int32→int64, float→double) stay green while a
  * breaking one (numeric→string, date→string) fails loudly. */
class FixtureSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  sealed trait Family { def ok(t: DataType): Boolean }
  private case object Integral extends Family {
    def ok(t: DataType): Boolean = t match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
  }
  private case object Fractional extends Family {
    def ok(t: DataType): Boolean = t match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
  }
  private case object Str extends Family {
    def ok(t: DataType): Boolean = t.isInstanceOf[StringType]
  }
  private case object DateOrTime extends Family {
    def ok(t: DataType): Boolean = t match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }
  }
  private case object FloatArray extends Family {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(et, _) => Fractional.ok(et)
      case _ => false
    }
  }
  private case object AnyTime extends Family {
    // events.ts specifically: EventTime.load absorbs long-nanos too
    def ok(t: DataType): Boolean = Integral.ok(t) || DateOrTime.ok(t)
  }

  private val expected: Map[String, Map[String, Family]] = Map(
    "region" -> Map("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Map("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "customer" -> Map("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_mktsegment" -> Str,
      "c_acctbal" -> Fractional),
    "supplier" -> Map("s_suppkey" -> Integral, "s_nationkey" -> Integral),
    "part" -> Map("p_partkey" -> Integral, "p_type" -> Str,
      "p_retailprice" -> Fractional),
    "orders" -> Map("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_totalprice" -> Fractional, "o_orderdate" -> DateOrTime,
      "o_orderpriority" -> Str),
    "lineitem" -> Map("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_shipdate" -> DateOrTime),
    "events" -> Map("event_id" -> Integral, "ts" -> AnyTime,
      "user_id" -> Integral, "event_type" -> Str, "value" -> Fractional,
      "props" -> Str),
    "documents" -> Map("doc_id" -> Integral, "text" -> Str,
      "lang" -> Str, "source" -> Str),
    "embeddings" -> Map("vec_id" -> Integral, "embedding" -> FloatArray,
      "label" -> Integral))

  for ((table, cols) <- expected.toSeq.sortBy(_._1))
    test(s"$table: gate-relied columns present with compatible types") {
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((name, family) <- cols) {
        assert(byName.contains(name),
          s"$table.$name vanished from the fixture — schema now: $schema")
        assert(family.ok(byName(name)),
          s"$table.$name drifted to ${byName(name)} — gates assume $family")
      }
    }
}
