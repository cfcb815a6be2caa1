package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Group-level similarity via a MinHash-union [[Aggregator]].
  *
  * MinHash signatures are unionable: the signature of a set union is the
  * element-wise minimum of the signatures. Aggregating per group therefore
  * yields the group's signature in one pass with map-side partial
  * aggregation (the aggregator's `merge` IS the partial combine), and any
  * two groups' Jaccard similarity is then estimated driver-free from
  * fixed-width signatures — the standard sketch for corpus-vs-corpus
  * overlap at 100 TB (signatures shuffle, documents never do).
  */
object GroupSimilarity {

  /** Element-wise-min union of minhash signatures. Empty groups → null. */
  class MinHashUnion(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      if (sig != null && sig.length == numHashes) {
        var i = 0
        while (i < numHashes) {
          if (sig(i) < buf(i)) buf(i) = sig(i)
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] =
      if (buf.forall(_ == Long.MaxValue)) null else buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Estimated Jaccard between two equal-length signatures: fraction of
    * agreeing positions. */
  def estimatedJaccard(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a).cast("double")

  /** Per-`groupCol` MinHash signatures, then all group-pair similarity
    * estimates. The per-doc signature is row-local; the aggregation is one
    * shuffle of fixed-width arrays; the pair join is over G groups
    * (G ≪ rows). */
  def groupPairSimilarity(df: DataFrame, groupCol: String, textCol: String,
      numHashes: Int = 128, k: Int = 3): DataFrame = {
    val agg = new MinHashUnion(numHashes).toColumn
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df
      .select(col(groupCol).as("grp"),
        TextExpressions.minhash(col(textCol), numHashes, k).as("sig"))
      .filter(col("sig").isNotNull)
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("gsig"))
      .toDF("grp", "gsig")

    val l = sigs.select(col("grp").as("grp_a"), col("gsig").as("sig_a"))
    val r = sigs.select(col("grp").as("grp_b"), col("gsig").as("sig_b"))
    l.crossJoin(r).filter(col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        round(estimatedJaccard(col("sig_a"), col("sig_b")), 6)
          .as("est_jaccard"))
  }
}
