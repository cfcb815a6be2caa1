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

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import TextExpressions.{DefaultNumHashes, DefaultShingleK}
    reg.createOrReplaceTempFunction("fnv1a64",
      unary("fnv1a64")(TextExpressions.Fnv1a64), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      unary("simhash64")(TextExpressions.SimHash64(_, DefaultShingleK)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash128",
      unary("minhash128")(
        TextExpressions.MinHashSignature(_, DefaultNumHashes, DefaultShingleK)),
      "scala_udf")
    reg.createOrReplaceTempFunction("shingles3",
      unary("shingles3")(TextExpressions.ShingleSet(_, DefaultShingleK)), "scala_udf")
    reg.createOrReplaceTempFunction("emb_lsh_bucket",
      unary("emb_lsh_bucket")(VectorFunctions.EmbeddingLshBucket(_,
        VectorFunctions.DefaultLshBits, VectorFunctions.DefaultLshSeed)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      binary("cosine_sim")(VectorFunctions.CosineSimilarity), "scala_udf")
  }
}
