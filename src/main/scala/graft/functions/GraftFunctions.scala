package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the custom Catalyst expressions, so the pure-SQL
  * surface has them too:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT fnv1a64(text), simhash64(text), minhash128(text) FROM docs")
  * }}}
  *
  * Defaults come from the canonical constants on TextExpressions /
  * VectorFunctions so the SQL names and the Column API cannot drift.
  * Builders validate arity up front — the analyzer surfaces the message as
  * an AnalysisException instead of a runtime `empty.head`.
  */
object GraftFunctions {

  private def unary(name: String)(build: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${exprs.length}")
    build(exprs.head)
  }

  private def binary(name: String)(build: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments, got ${exprs.length}")
    build(exprs(0), exprs(1))
  }

  /** Single source of truth for the SQL-surface names — shared by the
    * session-level [[register]] and the extensions-level
    * [[injectInto]] so the two paths cannot drift. */
  private def entries: Seq[(String, Seq[Expression] => Expression)] = {
    import TextExpressions.{DefaultNumHashes, DefaultShingleK}
    Seq(
      "fnv1a64" -> unary("fnv1a64")(TextExpressions.Fnv1a64),
      "simhash64" -> unary("simhash64")(
        TextExpressions.SimHash64(_, DefaultShingleK)),
      "minhash128" -> unary("minhash128")(
        TextExpressions.MinHashSignature(_, DefaultNumHashes, DefaultShingleK)),
      "shingles3" -> unary("shingles3")(
        TextExpressions.ShingleSet(_, DefaultShingleK)),
      "emb_lsh_bucket" -> unary("emb_lsh_bucket")(
        VectorFunctions.EmbeddingLshBucket(_,
          VectorFunctions.DefaultLshBits, VectorFunctions.DefaultLshSeed)),
      "cosine_sim" -> binary("cosine_sim")(VectorFunctions.CosineSimilarity))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    entries.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Extensions-path registration: a session created with
    * `spark.sql.extensions=graft.plans.GraftSparkExtensions` gets the
    * SQL functions without any imperative [[register]] call — the same
    * wiring a deployed cluster would configure once. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    entries.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftFunctions", name),
        builder))
    }
}
