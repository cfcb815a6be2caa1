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

  /** IVF (inverted-file) ANN: a coarse quantizer of `nlist` deterministic
    * centroid vectors partitions the corpus into cells; a query searches
    * only its `nprobe` nearest cells with exact cosine.
    *
    * At scale the assignment is computed once and persisted partitioned by
    * `cell`, so a query prunes to nprobe/nlist of the data before any
    * distance math — the complementary scale path to sign-LSH banding
    * (IVF: few coarse cells, good for clustered corpora; LSH: many hash
    * buckets, good for high-similarity retrieval).
    *
    * Centroids here are a deterministic sample of the corpus (every
    * `stride`-th vector) rather than k-means iterations — the partition/
    * prune plumbing is identical and stays reproducible run to run. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row

    // deterministic centroid sample (small: nlist rows to the driver)
    val ids = df.select(col(idCol)).orderBy(col(idCol)).limit(100000)
      .collect().map(_.get(0) match {
        case n: java.lang.Number => n.longValue() // exact for int/long ids
        case other => throw new IllegalArgumentException(
          s"ivfTopK requires a numeric id column, got ${other.getClass}")
      })
    val stride = math.max(1, ids.length / nlist)
    val centroidIds = ids.zipWithIndex.collect {
      case (id, i) if i % stride == 0 => id
    }.take(nlist)
    val centroids: Array[(Int, Array[Double])] = df
      .filter(col(idCol).isin(centroidIds.map(_.asInstanceOf[Any]): _*))
      .select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Any](1).map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
        }.toArray
      }

    // nprobe cells nearest to the query (driver-side: nlist tiny)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na) / math.sqrt(nb)
    }
    val probeCells = centroids.sortBy { case (_, c) => -cos(query, c) }
      .take(nprobe).map(_._1).toSet

    // assignment: argmax cosine over the centroid matrix — a single native
    // expression carrying the matrix as state (same argmax/tie semantics as
    // a sort_array-of-(negcos,cell) formulation, without a thousands-of-
    // nodes literal tree for the optimizer to re-walk per run)
    val centroidMatrix = centroids.map(_._2) // index == cell id
    val assigned = df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("cell", VectorFunctions.nearestCentroid(col("vec"), centroidMatrix))

    assigned.filter(col("cell").isin(probeCells.toSeq: _*))
      .select(col("vec_id"),
        round(VectorFunctions.cosine(col("vec"), vecLit(query)), 6).as("cos"))
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
