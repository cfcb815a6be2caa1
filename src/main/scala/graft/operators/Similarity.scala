package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]]: exact cosine against a broadcast query vector —
  *   O(n) scan, the correctness baseline. The query vector travels as a
  *   literal, so the plan is a pure projection + TakeOrderedAndProject
  *   (no shuffle of the table).
  * - [[lshTopK]]: the scale path — candidates are rows sharing at least one
  *   sign-random-projection band bucket with the query, exact cosine only
  *   on candidates. At 100 TB with a bucketed/partitioned layout on the
  *   band keys, this prunes the scan to matching partitions.
  */
object Similarity {

  private def vecLit(q: Array[Double]) = array(q.map(lit): _*)

  /** Exact top-k by cosine vs a constant query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol).as("vec_id"),
      round(VectorFunctions.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  /** ANN top-k: band-bucket candidates, exact rank among them. Recall is
    * tuned by (bandBits ↓, bandCount ↑). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, bandBits: Int = 8, bandCount: Int = 8,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    // query's band buckets, computed once on the driver through the same
    // expression the rows use (no skew: tiny literal map pushed into filter)
    val qdf = spark.range(1).select(
      (0 until bandCount).map(b =>
        VectorFunctions.embLshBucket(vecLit(query), bandBits, seed + b)
          .as(s"q$b")): _*)
    val qBuckets = qdf.collect().head
    val qb = (0 until bandCount).map(b => qBuckets.getInt(b))

    val candidate = (0 until bandCount).map(b =>
      VectorFunctions.embLshBucket(col(vecCol), bandBits, seed + b) === lit(qb(b)))
      .reduce(_ || _)

    df.filter(candidate)
      .select(col(idCol).as("vec_id"),
        round(VectorFunctions.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Fetch one embedding as the query vector (driver-side, k rows ≪ data). */
  def vectorOf(spark: SparkSession, dir: String, vecId: Long): Array[Double] = {
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === vecId)
      .select(col("embedding"))
      .collect().head.getSeq[Float](0).map(_.toDouble).toArray
  }
}
