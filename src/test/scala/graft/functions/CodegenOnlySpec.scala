package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom-expression inventory's codegen contract, made executable:
  * every row-local graft expression must generate real code — never
  * lean on `CodegenFallback` — and the generated code must COMPILE,
  * verified by evaluating each one in a session with
  * `spark.sql.codegen.fallback=false` (a janino failure then surfaces
  * instead of silently degrading to the interpreted path) and
  * `factoryMode=CODEGEN_ONLY` (interpreted projections disabled
  * entirely). A hot-path expression that quietly fell back would
  * re-introduce exactly the per-row interpretation the r13 s12
  * scale-killer was made of. */
class CodegenOnlySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.codegen.fallback", "false")
    .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def exprOf(c: org.apache.spark.sql.Column): Expression =
    ColumnBridge.expression(c)

  test("no custom scalar expression is a CodegenFallback") {
    val text = col("t")
    val vec = col("v")
    val all: Seq[(String, Expression)] = Seq(
      "fnv1a64" -> exprOf(TextExpressions.fnv1a64(text)),
      "mix64" -> exprOf(TextExpressions.mix64(col("id"))),
      "minhash" -> exprOf(TextExpressions.minhash(text, 16, 3)),
      "simhash" -> exprOf(TextExpressions.simhash(text, 3)),
      "shingleSet" -> exprOf(TextExpressions.shingleSet(text, 3)),
      "langId" -> exprOf(TextExpressions.langId(text,
        Seq("en" -> Seq("the", "and"), "de" -> Seq("der", "und")))),
      "cosine" -> exprOf(VectorFunctions.cosine(vec, vec)),
      "dot" -> exprOf(VectorFunctions.dot(vec, vec)),
      "embLshBucket" -> exprOf(VectorFunctions.embLshBucket(vec, 8, 42L)),
      "nearestCentroid" -> exprOf(VectorFunctions.nearestCentroid(vec,
        Array(Array(1.0, 0.0), Array(0.0, 1.0)))),
      "qlshSignature" -> exprOf(VectorFunctions.qlshSignature(vec, 4, 8)),
      "qlshAnyMatch" -> exprOf(VectorFunctions.qlshAnyMatch(vec,
        Seq(0L, 1L, 2L, 3L), 4)))
    all.foreach { case (name, e) =>
      assert(!e.isInstanceOf[CodegenFallback],
        s"$name must generate code, not fall back to interpreted eval")
    }
  }

  test("every expression's generated code compiles (fallback disabled)") {
    // parquet-free but non-local source: range → project keeps the
    // expressions out of constant folding so codegen actually runs
    val df = spark.range(0, 64)
      .select(col("id"),
        concat(lit("the quick and der brown und fox w"),
          col("id").cast("string")).as("t"),
        transform(sequence(lit(0), lit(7)),
          i => (i.cast("double") / 7.0d - 0.5d) *
            (col("id") % 5 + 1).cast("double"))
          .cast("array<double>").as("v"))
    val out = df.select(
      TextExpressions.fnv1a64(col("t")).as("h"),
      TextExpressions.mix64(col("id")).as("m"),
      TextExpressions.minhash(col("t"), 16, 3).as("mh"),
      TextExpressions.simhash(col("t"), 3).as("sh"),
      TextExpressions.shingleSet(col("t"), 3).as("ss"),
      TextExpressions.langId(col("t"),
        Seq("en" -> Seq("the", "and"), "de" -> Seq("der", "und"))).as("lid"),
      VectorFunctions.cosine(col("v"), col("v")).as("cos"),
      VectorFunctions.dot(col("v"), col("v")).as("dp"),
      VectorFunctions.embLshBucket(col("v"), 8, 42L).as("b"),
      VectorFunctions.nearestCentroid(col("v"),
        Array(Array.fill(8)(1.0), Array.fill(8)(-1.0))).as("nc"),
      VectorFunctions.qlshSignature(col("v"), 4, 8).as("sig"),
      VectorFunctions.qlshAnyMatch(col("v"), Seq(0L, 1L, 2L, 3L), 4).as("am"))
    val rows = out.collect()
    assert(rows.length == 64)
    // spot-check semantics survived the codegen path
    assert(rows.forall(r => math.abs(r.getDouble(6) - 1.0) < 1e-9),
      "cosine(v, v) must be 1")
    assert(rows.forall(_.getSeq[Long](10).length == 8))
    // and the projection genuinely ran inside a codegen stage
    assert(out.queryExecution.executedPlan.toString.contains("*("),
      out.queryExecution.executedPlan.toString)
  }
}
