package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salting for the case AQE's runtime skew-join
  * can't fix — a hot key so large that even one partition of it overflows
  * an executor.
  *
  * The left (large, skewed) side gets a deterministic salt in [0, factor)
  * derived from hashing its whole row; the right side is replicated
  * `factor` times with every salt value. The join key becomes
  * (key, salt), splitting each hot key into `factor` shuffle partitions.
  * Results are identical to a plain inner join (verified by the spec and
  * the p02 oracle); cost is `factor`× replication of the right side — use
  * for joins where the right side is modest but too big to broadcast.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    val saltCol = "__graft_salt" // unlikely to collide with user columns
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"column $saltCol already exists")
    // deterministic salt: hash of the hashable left columns (Spark's hash()
    // rejects MapType) → stable across task retries
    val hashable = left.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    val salted = left.withColumn(saltCol,
      pmod(hash(hashable: _*), lit(factor)))
    val replicated = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
