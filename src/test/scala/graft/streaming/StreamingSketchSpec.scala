package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch

/** Streaming quantile sketch (excel_stream_quantile): the keyed state
  * after N micro-batches must equal the BATCH sketch over the union —
  * exactly, because the derandomized level is a pure function of the
  * key. */
class StreamingSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("final streaming snapshot equals the batch sketch, any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 64
    val rows = (0 until 3000).map(i =>
      (s"s${i % 2}", i.toLong, (i * 37 % 1000).toLong))
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSketch.quantileSketch(
      input.toDF().toDF("slice", "key", "value"),
      "slice", "key", "value", capacity = cap)
      .writeStream.format("memory").queryName("sk_out")
      .outputMode("append").start()
    try {
      // three uneven batches, deliberately out of key order
      input.addData(rows.slice(2000, 3000))
      q.processAllAvailable()
      input.addData(rows.slice(0, 500))
      q.processAllAvailable()
      input.addData(rows.slice(500, 2000))
      q.processAllAvailable()
      val fin = spark.table("sk_out").groupBy("slice")
        .agg(max(struct(col("n_total"), col("t_slice"), col("n_kept"),
          col("est_p50"))).as("m"))
        .select(col("slice"), col("m.n_total"), col("m.t_slice"),
          col("m.n_kept"), col("m.est_p50"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap

      // batch ground truth: per-slice threshold + kept + p50 estimate
      // through the BATCH operator pipeline over the union of all rows
      val df = rows.toDF("slice", "key", "value")
      val lvls = QuantileSketch.withLevels(df, col("slice"), col("key"),
        col("value"))
      val lc = QuantileSketch.levelCounts(lvls)
      val th = QuantileSketch.thresholds(lc, cap)
      val thMap = th.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val kept = lvls.join(broadcast(th), "slice")
        .filter(col("lvl") >= col("t_slice"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      rows.map(_._1).distinct.foreach { s =>
        val (nT, t, nK, p50) = fin(s)
        val sliceRows = rows.filter(_._1 == s)
        assert(nT == sliceRows.size)
        assert(t == thMap(s), s"slice $s threshold $t != batch ${thMap(s)}")
        val sliceKept = kept.filter(_._1 == s).map(x => (x._3, x._2))
          .sortBy(identity)
        assert(nK == sliceKept.size)
        val target = (nT * 500 + 999) / 1000
        val w = 1L << t
        val expected = sliceKept.zipWithIndex
          .collectFirst { case ((v, _), i) if (i + 1) * w >= target => v }
          .getOrElse(sliceKept.last._1)
        assert(p50 == expected, s"slice $s p50 $p50 != batch $expected")
      }
    } finally q.stop()
  }
}
