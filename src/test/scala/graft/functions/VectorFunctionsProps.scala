package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Similarity

/** Property pins for the r14 codegen'd vector kernels: against random
  * float vectors (negatives, zeros, tiny/large magnitudes, arbitrary
  * dims), the single-pass kernels must agree BIT FOR BIT with the
  * declarative forms they replaced — [[VectorFunctions.DotProduct]] with
  * the `aggregate(zip_with(...))` sequential fold, and the quantized-LSH
  * signature/any-match kernels with the per-band
  * [[Similarity.quantizedLshBucket]] executable spec and the driver
  * replica. The fixture-backed three-way test (LlmOpsSpec) covers the
  * real corpus; these cover the adversarial envelope. */
object VectorFunctionsProps extends Properties("vector.kernels") {

  // each sample runs Spark jobs; keep the sample count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genComponent: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1.0f, 1.0f),
    Gen.chooseNum(-100.0f, 100.0f),
    Gen.const(0.0f))

  private def genVecs(dim: Int): Gen[List[Array[Float]]] = for {
    n <- Gen.chooseNum(1, 12)
    rows <- Gen.listOfN(n, Gen.listOfN(dim, genComponent))
  } yield rows.map(_.toArray)

  private val genDimmed: Gen[(Int, List[Array[Float]])] = for {
    dim <- Gen.chooseNum(1, 9)
    vecs <- genVecs(dim)
  } yield (dim, vecs)

  private def toDf(vecs: List[Array[Float]]) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
  }

  /** The declarative sequential fold DotProduct replaced. */
  private def declarativeDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(transform(a, _.cast("double")),
      transform(b, _.cast("double")), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  property("DotProduct == aggregate(zip_with) fold, bit for bit") =
    Prop.forAll(genDimmed) { case (_, vecs) =>
      val df = toDf(vecs)
      val rows = df.select(
        VectorFunctions.dot(col("vec"), col("vec")).as("k"),
        declarativeDot(col("vec"), col("vec")).as("d")).collect()
      rows.forall(r =>
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }

  property("qlshSignature == per-band declarative spec == driver replica") =
    Prop.forAll(genDimmed, Gen.oneOf((2, 4), (4, 8), (8, 4))) {
      case ((_, vecs), (bits, bands)) =>
        val df = toDf(vecs)
        val cols = (0 until bands).map(b =>
          Similarity.quantizedLshBucket(col("vec"), bits, b).as(s"b$b"))
        val got = df.select((col("id") +:
          VectorFunctions.qlshSignature(col("vec"), bits, bands).as("sig") +:
          cols): _*).collect()
        got.forall { r =>
          val sig = r.getSeq[Long](1)
          val spec = (0 until bands).map(b => r.getLong(b + 2))
          val replica = Similarity.quantizedBuckets(
            vecs(r.getLong(0).toInt).map(_.toDouble), bits, bands)
          sig == spec && sig == replica
        }
    }

  property("qlshAnyMatch == signature-membership, incl. augmented tail") =
    Prop.forAll(genDimmed, Gen.chooseNum(-2.0, 2.0)) {
      case ((_, vecs), tail) =>
        val df = toDf(vecs)
        val qb = Similarity.quantizedBuckets(
          vecs.head.map(_.toDouble) :+ tail, 4, 8)
        val rows = df.select(col("id"),
          VectorFunctions.qlshAnyMatchAug(col("vec"), lit(tail), qb, 4)
            .as("m"),
          VectorFunctions.qlshSignatureAug(col("vec"), lit(tail), 4, 8)
            .as("sig")).collect()
        rows.forall { r =>
          val viaSig = r.getSeq[Long](2).zip(qb).exists { case (a, b) => a == b }
          r.getBoolean(1) == viaSig
        } && {
          // the augmenting query always matches its own augmented row
          rows.find(_.getLong(0) == 0L).exists(_.getBoolean(1))
        }
    }
}
