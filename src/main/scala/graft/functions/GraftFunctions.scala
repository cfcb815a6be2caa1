package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the custom Catalyst expressions, so the pure-SQL
  * surface has them too:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT fnv1a64(text), simhash64(text), minhash128(text) FROM docs")
  * }}}
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fnv1a64",
      exprs => TextExpressions.Fnv1a64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => TextExpressions.SimHash64(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("minhash128",
      exprs => TextExpressions.MinHashSignature(exprs.head, 128, 3), "scala_udf")
    reg.createOrReplaceTempFunction("shingles3",
      exprs => TextExpressions.ShingleSet(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("emb_lsh_bucket",
      exprs => VectorFunctions.EmbeddingLshBucket(exprs.head, 12, 42L), "scala_udf")
  }
}
