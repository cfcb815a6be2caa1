package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.functions.GraftHash

/** Property-based proof-check of the q53 merge theorem: for ANY multiset
  * of unique keys, ANY partition into slices, and ANY capacity, the
  * union of per-slice keep-sets re-thresholded above the floor equals
  * the direct one-shot sketch — threshold and rows. The replica below is
  * driver-side arithmetic (hundreds of samples are cheap); one property
  * pins the replica to the engine's Column expression. */
object QuantileSketchProps extends Properties("quantile.sketch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(120)

  private val MaxLevel = 20

  private def lvl(key: Long): Int = {
    val h = GraftHash.fnv1a64(key.toString.getBytes("UTF-8"))
    val m = h & ((1L << (MaxLevel + 1)) - 1)
    if (m == 0L) MaxLevel
    else java.lang.Long.bitCount(m ^ (m - 1)) - 1
  }

  private def threshold(keys: Seq[Long], cap: Int, floor: Int = 0): Int = {
    var t = floor
    while (keys.count(k => lvl(k) >= t) > cap) t += 1
    t
  }

  private val genCase = for {
    n <- Gen.chooseNum(0, 400)
    base <- Gen.chooseNum(0L, 1000000L)
    nSlices <- Gen.chooseNum(1, 6)
    cap <- Gen.chooseNum(1, 64)
  } yield ((0 until n).map(i => base + i * 7L), nSlices, cap)

  property("merged per-slice sketches == direct sketch (threshold + rows)") =
    Prop.forAll(genCase) { case (keys, nSlices, cap) =>
      val slices = keys.groupBy(k => ((k * 2654435761L) % nSlices + nSlices)
        % nSlices).values.toSeq
      val perSlice = slices.map { s =>
        val t = threshold(s, cap)
        (t, s.filter(k => lvl(k) >= t))
      }
      val floor = if (perSlice.isEmpty) 0 else perSlice.map(_._1).max
      val union = perSlice.flatMap(_._2)
      val tMerged = threshold(union, cap, floor)
      val tDirect = threshold(keys, cap)
      val merged = union.filter(k => lvl(k) >= tMerged).sorted
      val direct = keys.filter(k => lvl(k) >= tDirect).sorted
      (tMerged == tDirect) :| s"t: merged=$tMerged direct=$tDirect" &&
        (merged == direct) :| s"rows: ${merged.size} vs ${direct.size}"
    }

  property("driver replica matches the engine's level expression") = {
    lazy val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = (0L until 2000L) ++ Seq(Long.MaxValue, 0L, 987654321012L)
    val fromEngine = keys.toDF("key")
      .select(col("key"), QuantileSketch.levelOf(col("key")).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Prop(keys.forall(k => fromEngine(k) == lvl(k)))
  }
}
