package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Vector ops over `array<float>` embedding columns.
  *
  * `cosine` is a native codegen'd [[CosineSimilarity]] whose accumulation
  * order is EXACTLY the sequential `aggregate(zip_with(...))` fold it
  * replaces (and that the DuckDB oracle mirrors) — bit-identical results,
  * but a tight primitive loop inside whole-stage codegen instead of an
  * interpreted higher-order-function tree with per-element boxing. `dot`
  * keeps the declarative fold form.
  * [[EmbeddingLshBucket]] is the row-local sign-random-projection sketch
  * used by the scale path ([[graft.operators.Similarity]] bucketed joins).
  */
object VectorFunctions {

  /** Sequential-fold dot product of two float/double array columns —
    * a native codegen'd [[DotProduct]] whose accumulation order is
    * EXACTLY the `aggregate(zip_with(...))` fold it replaced
    * (dot = ((0+x₀y₀)+x₁y₁)+…), so results are bit-identical to the
    * declarative form the DuckDB oracles mirror, while staying inside
    * whole-stage codegen (r13 VERDICT item 1: the interpreted fold was
    * re-evaluated per band in the MIPS hot path). */
  def dot(a: Column, b: Column): Column = ColumnBridge.column(
    DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null if either side has zero norm, mismatched
    * length, or a null element (the semantics of the declarative
    * `dot(a,b) / (norm(a) * norm(b))` fold this compiles down from). */
  def cosine(a: Column, b: Column): Column = ColumnBridge.column(
    CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native cosine: one pass accumulating dot/‖a‖²/‖b‖² in index order —
    * the same operation sequence as the `aggregate(zip_with)` formulation
    * (dot = ((0+x₀y₀)+x₁y₁)+…; norms likewise; result dot/(√na·√nb)), so
    * values are bit-identical to it while staying in whole-stage codegen. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"

    private def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>/array<double> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

    @transient private lazy val leftFloat = left.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    @transient private lazy val rightFloat = right.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      // zip_with pads the shorter side with null → null result
      if (n != b.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val bad = ctx.freshName("bad")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val denom = ctx.freshName("denom")
        val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |final int $n = $a.numElements();
           |boolean $bad = ($n != $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |if (!$bad) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    final double $x = $getX;
           |    final double $y = $getY;
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |}
           |final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |if ($bad || $denom == 0.0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $dot / $denom;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
      copy(left = l, right = r)
  }

  /** Native sequential-fold dot product: [[CosineSimilarity]] minus the
    * norms. Null semantics match the `aggregate(zip_with(...))` fold it
    * replaces: mismatched lengths (zip_with null-padding) or a null
    * element poison the fold → null; two empty arrays → 0.0. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_product"

    private def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>/array<double> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

    @transient private lazy val leftFloat = left.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    @transient private lazy val rightFloat = right.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        i += 1
      }
      java.lang.Double.valueOf(dot)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val bad = ctx.freshName("bad")
        val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |final int $n = $a.numElements();
           |boolean $bad = ($n != $b.numElements());
           |double $dot = 0.0;
           |if (!$bad) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    $dot += ($getX) * ($getY);
           |  }
           |}
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $dot;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

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

  // ------------------------------------------------------ static kernels
  // Static entry points for doGenCode (see TextExpressions' kernels): one
  // direct static call per row instead of CodegenFallback's boxed eval().

  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Long, Int), Array[Array[Double]]]()

  /** Sign-random-projection bucket kernel. Hyperplanes are deterministic
    * in (bits, seed, dim) and cached statically per executor. */
  def lshBucketKernel(arr: ArrayData, bits: Int, seed: Long,
      isFloat: Boolean): Int = {
    val n = arr.numElements()
    val p = planeCache.computeIfAbsent((bits, seed, n), _ =>
      Array.tabulate(bits, n)((j, i) => hyperplane(j, i, seed)))
    var bucket = 0
    var j = 0
    while (j < bits) {
      val row = p(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += x * row(i)
        i += 1
      }
      if (acc >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** Deterministic pseudo-random in [-1, 1). FNV-1a alone has weak
    * high-bit avalanche on tiny inputs (observed: every hyperplane nearly
    * collinear → 2 distinct buckets); the splitmix64 finalizer fixes the
    * bit mixing. */
  private def hyperplane(j: Int, i: Int, seed: Long): Double = {
    var z = GraftHash.fnv1a64Seeded(
      Array((j >> 8).toByte, j.toByte, (i >> 8).toByte, i.toByte), seed)
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** IVF coarse-cell assignment kernel; ties and degenerate rows (null
    * element, zero norm, dimension mismatch) pick the lowest cell. */
  def nearestCentroidKernel(arr: ArrayData, centroids: Array[Array[Double]],
      norms: Array[Double], isFloat: Boolean): Int = {
    val n = arr.numElements()
    val dim = centroids(0).length
    if (n != dim) return 0
    val vec = new Array[Double](n)
    var i = 0
    var na = 0.0
    while (i < n) {
      if (arr.isNullAt(i)) return 0
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      vec(i) = x; na += x * x
      i += 1
    }
    val normV = math.sqrt(na)
    if (normV == 0.0) return 0
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += vec(i) * cv(i); i += 1 }
      val cos = dot / (normV * norms(c))
      if (cos > bestCos) { bestCos = cos; best = c } // strict > keeps lowest cell
      c += 1
    }
    best
  }

  case class EmbeddingLshBucket(child: Expression, bits: Int, seed: Long)
      extends UnaryExpression {

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

    @transient private lazy val elementIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override protected def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(
        lshBucketKernel(v.asInstanceOf[ArrayData], bits, seed, elementIsFloat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.VectorFunctions.lshBucketKernel($c, $bits, ${seed}L, $elementIsFloat)")

    override protected def withNewChildInternal(c: Expression): EmbeddingLshBucket =
      copy(child = c)
  }

  def embLshBucket(c: Column, bits: Int, seed: Long): Column =
    ColumnBridge.column(EmbeddingLshBucket(ColumnBridge.expression(c), bits, seed))

  /** IVF coarse-quantizer assignment: index (= cell id) of the centroid
    * with max cosine similarity to the row vector; ties and the all-null
    * cosine edge (zero-norm or dimension-mismatched row) pick the lowest
    * cell, matching the `sort_array(transform(...))` (negcos, cell)-asc
    * formulation this replaces — with the centroid matrix carried as plain
    * expression state instead of a thousands-of-nodes literal tree the
    * optimizer must re-walk on every run. */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {

    require(centroids.nonEmpty, "NearestCentroid requires at least one centroid")

    override def dataType: DataType = IntegerType
    override def prettyName: String = s"nearest_centroid_${centroids.length}"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
      }

    @transient private lazy val elementIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    @transient private lazy val centroidNorms: Array[Double] =
      centroids.map(c => math.sqrt(c.map(x => x * x).sum))

    override protected def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(nearestCentroidKernel(
        v.asInstanceOf[ArrayData], centroids, centroidNorms, elementIsFloat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // centroid matrix + norms ride into the generated class as references
      val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val normRef = ctx.addReferenceObj("centroidNorms", centroidNorms, "double[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.VectorFunctions.nearestCentroidKernel($c, $centRef, $normRef, $elementIsFloat)")
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  def nearestCentroid(c: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(c), centroids))

  // -------------------------------------------- quantized sign-LSH kernels
  // Integer-exact sign-projection LSH (the s06/s08/s12 family): components
  // quantize to floor(x·128), projection coefficients come from an integer
  // LCG of the flat (band, bit, dim) index, and each projection is an
  // integer dot product — no float summation order anywhere, so any engine
  // reproduces the buckets bit for bit. These kernels are the SINGLE
  // implementation of that arithmetic: the column expressions below, the
  // driver-side query replica ([[qlshBucketsOf]]), and the declarative
  // executable spec retained at
  // [[graft.operators.Similarity.quantizedLshBucket]] all agree bit for
  // bit (pinned by LlmOpsSpec's three-way equality test). r13 VERDICT
  // item 1: the per-band interpreted `aggregate(transform(...))` trees
  // re-evaluated the quantization once per band per row; these kernels
  // quantize once and emit every band in a single codegen'd pass.
  //
  // Null handling deviation (documented): a null array or null element
  // yields a NULL signature / FALSE match, where the declarative form
  // collapsed every band to bucket 0. No fixture carries null vectors;
  // null-poisoning is the saner contract for production data.

  final val QlshScale = 128d
  final val QlshMul = 2654435761L // Knuth multiplicative-hash constant
  final val QlshInc = 40503L
  final val QlshMod = 8191L // 2^13 - 1; coefficients in [-4095, 4095]

  /** Flat LCG coefficient table for (bandBits, bandCount, dims), cached
    * per executor: coef(t) = (t·QlshMul + QlshInc) mod QlshMod, centered.
    * t runs lexicographically over (band, bit, dim), matching the
    * `(band·bandBits + bit)·dims + j` index of the declarative form. */
  private val qlshCoefCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Long]]()

  private def qlshCoefs(bandBits: Int, bandCount: Int, dims: Int): Array[Long] =
    qlshCoefCache.computeIfAbsent((bandBits, bandCount, dims), _ => {
      val a = new Array[Long](bandBits * bandCount * dims)
      var t = 0
      while (t < a.length) {
        a(t) = (t.toLong * QlshMul + QlshInc) % QlshMod - (QlshMod - 1) / 2
        t += 1
      }
      a
    })

  /** floor(x·128) quantization of the vector (+ optional augmented tail
    * coordinate); null on any null element. */
  private def qlshQuantize(arr: ArrayData, extra: Double, hasExtra: Boolean,
      isFloat: Boolean): Array[Long] = {
    val n0 = arr.numElements()
    val n = if (hasExtra) n0 + 1 else n0
    val qv = new Array[Long](n)
    var i = 0
    while (i < n0) {
      if (arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      qv(i) = math.floor(x * QlshScale).toLong
      i += 1
    }
    if (hasExtra) qv(n0) = math.floor(extra * QlshScale).toLong
    qv
  }

  private def qlshBands(qv: Array[Long], bandBits: Int,
      bandCount: Int): Array[Long] = {
    val dims = qv.length
    val coefs = qlshCoefs(bandBits, bandCount, dims)
    val out = new Array[Long](bandCount)
    var band = 0
    while (band < bandCount) {
      var bucket = 0L
      var bit = 0
      while (bit < bandBits) {
        val off = (band * bandBits + bit) * dims
        var s = 0L
        var j = 0
        while (j < dims) { s += qv(j) * coefs(off + j); j += 1 }
        if (s >= 0) bucket |= (1L << bit)
        bit += 1
      }
      out(band) = bucket
      band += 1
    }
    out
  }

  /** All band buckets of a row vector in one pass (static codegen entry).
    * Null on any null element. */
  def qlshSignatureKernel(arr: ArrayData, extra: Double, hasExtra: Boolean,
      bandBits: Int, bandCount: Int,
      isFloat: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val qv = qlshQuantize(arr, extra, hasExtra, isFloat)
    if (qv == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      qlshBands(qv, bandBits, bandCount))
  }

  /** Does the row share ≥ 1 band bucket with the query signature `qb`?
    * Quantizes once, then walks bands bit by bit with early exit: a band
    * abandons as soon as one sign bit diverges from the query's, and the
    * row accepts at the first fully-matching band. False on null
    * elements. Static codegen entry. */
  def qlshAnyMatchKernel(arr: ArrayData, extra: Double, hasExtra: Boolean,
      qb: Array[Long], bandBits: Int, isFloat: Boolean): Boolean = {
    val qv = qlshQuantize(arr, extra, hasExtra, isFloat)
    if (qv == null) return false
    val dims = qv.length
    val bandCount = qb.length
    val coefs = qlshCoefs(bandBits, bandCount, dims)
    var band = 0
    while (band < bandCount) {
      val target = qb(band)
      var bit = 0
      var matched = true
      while (bit < bandBits && matched) {
        val off = (band * bandBits + bit) * dims
        var s = 0L
        var j = 0
        while (j < dims) { s += qv(j) * coefs(off + j); j += 1 }
        val b = if (s >= 0) 1L << bit else 0L
        if (b != (target & (1L << bit))) matched = false
        bit += 1
      }
      if (matched) return true
      band += 1
    }
    false
  }

  /** Driver-side band buckets for a query vector — the same kernel the
    * column expressions run, so query and corpus agree by construction. */
  def qlshBucketsOf(vec: Array[Double], bandBits: Int,
      bandCount: Int): Array[Long] =
    qlshBands(vec.map(x => math.floor(x * QlshScale).toLong), bandBits,
      bandCount)

  /** `array<long>` of all `bandCount` quantized-LSH band buckets, one
    * kernel pass per row. `extra` (augmented-MIPS tail coordinate) is a
    * double column appended before quantization when `hasExtra`. */
  case class QuantizedLshSignature(vec: Expression, extra: Expression,
      hasExtra: Boolean, bandBits: Int, bandCount: Int)
      extends BinaryExpression {

    override def left: Expression = vec
    override def right: Expression = extra
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = s"qlsh_sig_${bandBits}x$bandCount"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (vec.dataType, extra.dataType) match {
        case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (v, e) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (array<float|double>, double), got " +
              s"${v.catalogString}, ${e.catalogString}")
      }

    @transient private lazy val elementIsFloat: Boolean = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(v: Any, e: Any): Any =
      qlshSignatureKernel(v.asInstanceOf[ArrayData],
        e.asInstanceOf[Double], hasExtra, bandBits, bandCount, elementIsFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, e) => s"""
        |${ev.value} = graft.functions.VectorFunctions.qlshSignatureKernel(
        |  $v, $e, $hasExtra, $bandBits, $bandCount, $elementIsFloat);
        |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedLshSignature =
      copy(vec = l, extra = r)
  }

  /** Boolean "shares ≥ 1 band bucket with the query" predicate — the
    * candidate decision of the quantized ANN family as ONE codegen'd
    * expression (quantize once, early-exit band walk), replacing the
    * per-band `bucket(b) === lit(qb(b))` OR-chain that re-evaluated the
    * interpreted quantization `bandCount` times per row. */
  case class QuantizedLshAnyMatch(vec: Expression, extra: Expression,
      hasExtra: Boolean, qBuckets: Array[Long], bandBits: Int)
      extends BinaryExpression {

    override def left: Expression = vec
    override def right: Expression = extra
    override def dataType: DataType = BooleanType
    override def prettyName: String = s"qlsh_any_match_${bandBits}x${qBuckets.length}"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (vec.dataType, extra.dataType) match {
        case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (v, e) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (array<float|double>, double), got " +
              s"${v.catalogString}, ${e.catalogString}")
      }

    @transient private lazy val elementIsFloat: Boolean = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(v: Any, e: Any): Any =
      java.lang.Boolean.valueOf(qlshAnyMatchKernel(v.asInstanceOf[ArrayData],
        e.asInstanceOf[Double], hasExtra, qBuckets, bandBits, elementIsFloat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val qbRef = ctx.addReferenceObj("qBuckets", qBuckets, "long[]")
      defineCodeGen(ctx, ev, (v, e) =>
        s"graft.functions.VectorFunctions.qlshAnyMatchKernel(" +
          s"$v, $e, $hasExtra, $qbRef, $bandBits, $elementIsFloat)")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedLshAnyMatch =
      copy(vec = l, extra = r)
  }

  private val zeroD = org.apache.spark.sql.catalyst.expressions.Literal(0.0, DoubleType)

  def qlshSignature(vec: Column, bandBits: Int, bandCount: Int): Column =
    ColumnBridge.column(QuantizedLshSignature(ColumnBridge.expression(vec),
      zeroD, hasExtra = false, bandBits, bandCount))

  /** Signature over the augmented vector `vec :+ extra` (MIPS reduction). */
  def qlshSignatureAug(vec: Column, extra: Column, bandBits: Int,
      bandCount: Int): Column =
    ColumnBridge.column(QuantizedLshSignature(ColumnBridge.expression(vec),
      ColumnBridge.expression(extra), hasExtra = true, bandBits, bandCount))

  def qlshAnyMatch(vec: Column, qBuckets: Seq[Long], bandBits: Int): Column =
    ColumnBridge.column(QuantizedLshAnyMatch(ColumnBridge.expression(vec),
      zeroD, hasExtra = false, qBuckets.toArray, bandBits))

  /** Any-match over the augmented vector `vec :+ extra` (MIPS reduction). */
  def qlshAnyMatchAug(vec: Column, extra: Column, qBuckets: Seq[Long],
      bandBits: Int): Column =
    ColumnBridge.column(QuantizedLshAnyMatch(ColumnBridge.expression(vec),
      ColumnBridge.expression(extra), hasExtra = true, qBuckets.toArray,
      bandBits))
}
