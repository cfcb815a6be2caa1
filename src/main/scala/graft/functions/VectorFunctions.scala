package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Vector ops over `array<float>` embedding columns.
  *
  * `cosine`/`dot` are composed from `zip_with`/`aggregate` built-ins with
  * strictly sequential folds and explicit double casts — deterministic and
  * engine-portable (the DuckDB oracle mirrors the same fold order).
  * [[EmbeddingLshBucket]] is the row-local sign-random-projection sketch
  * used by the scale path ([[graft.operators.Similarity]] bucketed joins).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two float/double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null if either side has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** `bits`-bit sign-random-projection bucket id for an embedding.
    *
    * Hyperplane j, component i is a deterministic pseudo-random value in
    * [-1, 1) derived from FNV-1a of (seed, j, i) — no data files, no
    * broadcast, reproducible across executors. Vectors with small angular
    * distance land in equal buckets with high probability (Charikar's
    * SimHash for real vectors). */
  /** Canonical LSH defaults shared with the SQL registration. */
  final val DefaultLshBits = 12
  final val DefaultLshSeed = 42L

  case class EmbeddingLshBucket(child: Expression, bits: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = IntegerType
    override def prettyName: String = s"emb_lsh_$bits"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
      }

    // hoisted once per (deserialized) expression instance: element type and
    // the deterministic hyperplane matrix — recomputing FNV+mix per row
    // dominated the row-local cost at scale
    @transient private lazy val elementIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    @transient private var planes: Array[Array[Double]] = _

    private def planesFor(dim: Int): Array[Array[Double]] = {
      if (planes == null || planes(0).length < dim) {
        planes = Array.tabulate(bits, dim)((j, i) => hyperplane(j, i))
      }
      planes
    }

    override protected def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val p = planesFor(n)
      var bucket = 0
      var j = 0
      while (j < bits) {
        val row = p(j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          acc += x * row(i)
          i += 1
        }
        if (acc >= 0) bucket |= (1 << j)
        j += 1
      }
      java.lang.Integer.valueOf(bucket)
    }

    /** Deterministic pseudo-random in [-1, 1). FNV-1a alone has weak
      * high-bit avalanche on tiny inputs (observed: every hyperplane nearly
      * collinear → 2 distinct buckets); the splitmix64 finalizer fixes the
      * bit mixing. */
    private def hyperplane(j: Int, i: Int): Double = {
      var z = GraftHash.fnv1a64Seeded(
        Array((j >> 8).toByte, j.toByte, (i >> 8).toByte, i.toByte), seed)
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^= z >>> 33
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

    override protected def withNewChildInternal(c: Expression): EmbeddingLshBucket =
      copy(child = c)
  }

  def embLshBucket(c: Column, bits: Int, seed: Long): Column =
    ColumnBridge.column(EmbeddingLshBucket(ColumnBridge.expression(c), bits, seed))
}
