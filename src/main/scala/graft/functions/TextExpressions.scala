package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the LLM-pipeline operators.
  *
  * These are the only places this engine extends Catalyst (SURVEY.md §2.3,
  * §7 step 7): per-row hashing/sketching primitives that
  * `org.apache.spark.sql.functions` lacks. They are pure row-local
  * functions — no shuffle, no state — so every dedup/similarity operator
  * built on them scales linearly with the data and parallelizes perfectly.
  */
object TextExpressions {

  /** Canonical defaults shared by the Column API and the SQL registration
    * (graft.functions.GraftFunctions) so the two surfaces cannot drift. */
  final val DefaultShingleK = 3
  final val DefaultNumHashes = 128

  private def requireString(name: String, child: Expression): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${child.dataType.catalogString}")

  /** 64-bit FNV-1a rolling hash of a string — document fingerprinting.
    * Implements `doGenCode` so it stays inside whole-stage codegen. */
  case class Fnv1a64(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "fnv1a64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(prettyName, child)

    override protected def nullSafeEval(v: Any): Any =
      GraftHash.fnv1a64(v.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.fnv1a64($c.getBytes())")

    override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
  }

  /** splitmix64-style finalizer (murmur fmix constants) as a codegen
    * expression — full-avalanche mixing of an upstream 64-bit hash. FNV's
    * multiply only propagates low bits upward, so HLL-style sketches that
    * read bit POSITIONS (bucket prefix + leading-zero rank) need this
    * finalizer on top of [[Fnv1a64]]. The d06/d16 oracles already mirror
    * the identical constant sequence in HUGEINT SQL. */
  case class Mix64(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "mix64"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(v: Any): Any =
      GraftHash.mix64(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.mix64($c)")

    override protected def withNewChildInternal(c: Expression): Mix64 = copy(c)
  }

  /** Word k-shingles of a whitespace-tokenized, lowercased string.
    * Shared tokenization for MinHash / SimHash / Jaccard so all sketches
    * see the same shingle universe. */
  def shingles(s: UTF8String, k: Int): Array[String] = {
    val tokens = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (tokens.length < k) {
      if (tokens.isEmpty) Array.empty else Array(tokens.mkString(" "))
    } else {
      Array.tabulate(tokens.length - k + 1)(i =>
        tokens.slice(i, i + k).mkString(" "))
    }
  }

  // ------------------------------------------------------ static kernels
  // Top-level static entry points for the sketch expressions' doGenCode:
  // whole-stage codegen emits a single static call per row instead of the
  // CodegenFallback path (boxed eval() through an expression reference),
  // keeping the surrounding stage fused and allocation-light.

  /** MinHash signature kernel; null when the text has no shingles. */
  def minhashKernel(s: UTF8String, numHashes: Int, k: Int): ArrayData = {
    val sh = shingles(s, k)
    if (sh.isEmpty) return null
    val base = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      base(i) = GraftHash.fnv1a64(sh(i).getBytes("UTF-8"))
      i += 1
    }
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val seed = (j + 1) * 0x9e3779b97f4a7c15L
      var min = Long.MaxValue
      i = 0
      while (i < base.length) {
        val h = GraftHash.mix64(base(i) ^ seed)
        if (h < min) min = h
        i += 1
      }
      sig(j) = min
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash kernel; null when the text has no shingles. */
  def simhashKernel(s: UTF8String, k: Int): java.lang.Long = {
    val sh = shingles(s, k)
    if (sh.isEmpty) return null
    val counts = new Array[Int](64)
    sh.foreach { sg =>
      val h = GraftHash.fnv1a64(sg.getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Distinct sorted shingle-set kernel (never null). */
  def shingleSetKernel(s: UTF8String, k: Int): ArrayData = {
    val sh = shingles(s, k).distinct.sorted
    new GenericArrayData(sh.map(UTF8String.fromString): Array[Any])
  }

  /** Stopword-profile language-id kernel; profiles are pre-sorted by
    * language code (ties → first). */
  def langIdKernel(s: UTF8String,
      sorted: Array[(String, Array[String])]): UTF8String = {
    val str = s.trim().toLowerCase.toString
    val tokens = str.split("\\s+", -1)
    val distinct = new java.util.HashSet[String](tokens.length * 2)
    var i = 0
    while (i < tokens.length) { distinct.add(tokens(i)); i += 1 }
    var bestLang: String = null
    var bestHits = 0
    var p = 0
    while (p < sorted.length) {
      val (lang, ws) = sorted(p)
      var hits = 0
      var j = 0
      while (j < ws.length) {
        if (distinct.contains(ws(j))) hits += 1
        j += 1
      }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
      p += 1
    }
    UTF8String.fromString(if (bestHits == 0) "und" else bestLang)
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum hash over the document's word-`k`-shingles. Returns
    * array<bigint> of length `numHashes`; null/shingle-less docs → nulls.
    *
    * Row-local (the signature never sees other rows); the LSH banding join
    * that consumes it is where the (shuffle-based, scalable) pair search
    * happens — see [[graft.operators.Dedup]]. */
  case class MinHashSignature(child: Expression, numHashes: Int, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = s"minhash_$numHashes"
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(prettyName, child)

    // standard construction (see minhashKernel): hash each shingle's bytes
    // ONCE, derive the numHashes permutations by mixing (base ⊕ seed_j) —
    // ~|bytes|× less hashing than re-hashing bytes per permutation, same
    // LSH guarantees
    override protected def nullSafeEval(v: Any): Any =
      minhashKernel(v.asInstanceOf[UTF8String], numHashes, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.TextExpressions.minhashKernel($c, $numHashes, $k);
        ${ev.isNull} = ${ev.value} == null;
      """)

    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  /** 64-bit SimHash over word `k`-shingles: bit b of the result is the
    * sign of the sum over shingles of ±1 at bit b of each shingle's hash. */
  case class SimHash64(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(prettyName, child)

    override protected def nullSafeEval(v: Any): Any =
      simhashKernel(v.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Long ${ev.value}_r = graft.functions.TextExpressions.simhashKernel($c, $k);
        if (${ev.value}_r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}_r.longValue();
        }
      """)

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** Distinct word-k-shingles as array<string> (exact Jaccard inputs). */
  case class ShingleSet(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = s"shingles_$k"
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(prettyName, child)

    override protected def nullSafeEval(v: Any): Any =
      shingleSetKernel(v.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExpressions.shingleSetKernel($c, $k)")

    override protected def withNewChildInternal(c: Expression): ShingleSet =
      copy(child = c)
  }

  /** Generator (UDTF): one output row per DISTINCT word-k-shingle of the
    * input text, each carrying the document's distinct-shingle count —
    * the streaming single-pass form of
    * `explode(shingleSet(text))` + `size(shingleSet(text))`. The
    * inverted-index dedup path uses it to build posting rows without
    * materializing each document's shingle array (`GenericArrayData` of
    * boxed strings, sorted) only to explode it again; null/shingle-less
    * texts generate nothing, mirroring explode of an empty array. */
  case class ShingleExplode(child: Expression, k: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.Generator
      with CodegenFallback {

    override def elementSchema: StructType =
      new StructType()
        .add("shingle", StringType, nullable = false)
        .add("sh_size", IntegerType, nullable = false)
    override def prettyName: String = s"shingle_explode_$k"
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(prettyName, child)

    override def eval(input: InternalRow): scala.collection.IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) Iterator.empty
      else {
        val sh = shingles(v.asInstanceOf[UTF8String], k)
        if (sh.isEmpty) Iterator.empty
        else {
          val seen = new java.util.LinkedHashSet[String](sh.length * 2)
          sh.foreach(seen.add)
          val n = seen.size
          seen.iterator().asScala.map(s =>
            InternalRow(UTF8String.fromString(s), n))
        }
      }
    }

    override protected def withNewChildInternal(c: Expression): ShingleExplode =
      copy(child = c)
  }

  /** Stopword-profile language ID as a single native expression.
    *
    * Replicates EXACTLY the declarative form it replaces (5 literal-array
    * `array_intersect`s + `sort_array` of structs — a >100-node tree whose
    * per-query Janino compile and per-row interpreted set-builds dominated
    * t02): distinct whitespace tokens of `lower(trim(text))` (Spark trim =
    * spaces only; split keeps trailing empties), hit count per profile,
    * most hits wins, ties to the lexicographically-first language, zero
    * hits → "und". Profiles are plain expression state, probed against one
    * per-row token set. */
  case class LangId(child: Expression, profiles: Seq[(String, Seq[String])])
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "lang_id"
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(prettyName, child)

    @transient private lazy val sorted: Array[(String, Array[String])] =
      profiles.sortBy(_._1).map { case (l, ws) => (l, ws.toArray) }.toArray

    // same pipeline as lower(trim(text)) → split("\s+", -1) → distinct;
    // ties → first language code (see langIdKernel)
    override protected def nullSafeEval(v: Any): Any =
      langIdKernel(v.asInstanceOf[UTF8String], sorted)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // profile matrix rides into the generated class as a reference
      val profRef = ctx.addReferenceObj("profiles", sorted, "scala.Tuple2[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.langIdKernel($c, $profRef)")
    }

    override protected def withNewChildInternal(c: Expression): LangId =
      copy(child = c)
  }

  // -------------------------------------------------------- Column API

  def fnv1a64(c: Column): Column = ColumnBridge.column(
    Fnv1a64(ColumnBridge.expression(c)))

  def mix64(c: Column): Column = ColumnBridge.column(
    Mix64(ColumnBridge.expression(c)))

  def minhash(c: Column, numHashes: Int = DefaultNumHashes, k: Int = DefaultShingleK): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(c), numHashes, k))

  def simhash(c: Column, k: Int = DefaultShingleK): Column = ColumnBridge.column(
    SimHash64(ColumnBridge.expression(c), k))

  def shingleSet(c: Column, k: Int = DefaultShingleK): Column = ColumnBridge.column(
    ShingleSet(ColumnBridge.expression(c), k))

  def langId(c: Column, profiles: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(c), profiles))

  def shingleExplode(c: Column, k: Int = DefaultShingleK): Column =
    ColumnBridge.column(ShingleExplode(ColumnBridge.expression(c), k))
}
