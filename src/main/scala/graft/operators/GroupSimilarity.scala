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

  /** Per-`groupCol` MinHash signatures, then group-pair similarity
    * estimates. The per-doc signature is row-local; the aggregation is one
    * shuffle of fixed-width arrays.
    *
    * The pair step adapts to the group count G (one cheap count over the
    * persisted G-row signature table — fixed-width rows, a few KB per
    * group, the classic "materialize the sketch table" shape):
    *
    *  - G ≤ `maxAllPairsGroups`: exact all-pairs over the G sketches.
    *    G² stays trivial (≤ ~32k pairs at the default cap) and every pair —
    *    including dissimilar ones — gets an estimate.
    *  - G > `maxAllPairsGroups`: LSH banding over the GROUP signatures
    *    (same banding as [[Dedup.minhashLshPairs]], reusing the unioned
    *    sketch as the banding input), so the pair step is an equi-join on
    *    (band, bandHash) — O(candidates), never G². Pairs sharing no band
    *    are dropped, which is the point: at 10⁵⁺ groups only
    *    high-similarity pairs are wanted, and band collision probability
    *    1−(1−j^r)^b is the standard recall knob (bands=32, r=4 at the
    *    default numHashes=128 gives >0.99 recall at j ≥ 0.5).
    */
  def groupPairSimilarity(df: DataFrame, groupCol: String, textCol: String,
      numHashes: Int = 128, k: Int = 3, bands: Int = 32,
      maxAllPairsGroups: Int = 256): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
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
      // persisted: the G-row sketch table is read by the path-choosing
      // count AND (on the banded path) three consumers; recomputing the
      // full-corpus aggregation per consumer would be the real scale bug
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val groupCount = sigs.count()
    if (groupCount <= maxAllPairsGroups) {
      val l = sigs.select(col("grp").as("grp_a"), col("gsig").as("sig_a"))
      val r = sigs.select(col("grp").as("grp_b"), col("gsig").as("sig_b"))
      l.crossJoin(r).filter(col("grp_a") < col("grp_b"))
        .select(col("grp_a"), col("grp_b"),
          estimatedJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
    } else {
      // banded equi-join: identical candidate generation to
      // Dedup.minhashLshPairs, but over G unioned sketches instead of N
      // per-doc ones. Candidates stay narrow (group keys only); sketches
      // are re-attached after the pair dedup.
      val r = numHashes / bands
      val banded = sigs.select(col("grp"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("gsig"), b * r + lit(1), lit(r)), b)))
          .as(Seq("band", "bhash")))
      val left = banded.select(col("grp").as("grp_a"), col("band"), col("bhash"))
      val right = banded.select(col("grp").as("grp_b"), col("band"), col("bhash"))
      val candidates = left.join(right, Seq("band", "bhash"))
        .filter(col("grp_a") < col("grp_b"))
        .select("grp_a", "grp_b")
        .dropDuplicates("grp_a", "grp_b")
      candidates
        .join(sigs.select(col("grp").as("grp_a"), col("gsig").as("sig_a")), "grp_a")
        .join(sigs.select(col("grp").as("grp_b"), col("gsig").as("sig_b")), "grp_b")
        .select(col("grp_a"), col("grp_b"),
          estimatedJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
    }
  }
}
