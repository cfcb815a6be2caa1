package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** Streaming count–min (excel_stream_heavyhitters): the keyed register
  * state after N micro-batches must equal the batch sketch over the
  * union — exactly, because CM registers are sums — and estimates are
  * never underestimates even when the width forces collisions. */
class StreamingHeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def runStream(rows: Seq[(String, String)], width: Int,
      splits: Seq[Int]): Map[(String, String), (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val name = s"hh_out_$width"
    val q = StreamingHeavyHitters.countMin(
      input.toDF().toDF("slice", "key"), "slice", "key", width = width)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (splits :+ rows.size).sliding(2).foreach { case Seq(a, b) =>
        input.addData(rows.slice(a, b))
        q.processAllAvailable()
      }
      spark.table(name).groupBy("slice", "key")
        .agg(max(struct(col("n_total"), col("est_count"))).as("m"))
        .collect().map { r =>
          (r.getString(0), r.getString(1)) ->
            (r.getStruct(2).getLong(0), r.getStruct(2).getLong(1))
        }.toMap
    } finally q.stop()
  }

  test("streaming estimates equal exact counts at ample width, any split") {
    val rows = (0 until 2000).map(i => (s"s${i % 2}", s"k${i % 7}"))
    val fin = runStream(rows, width = 1024, splits = Seq(0, 1300, 1400))
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = rows.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
    assert(fin.keySet == exact.keySet)
    fin.foreach { case ((s, k), (nTotal, est)) =>
      assert(nTotal == totals(s), s"slice $s total")
      assert(est == exact((s, k)), s"($s,$k): est $est != ${exact((s, k))}")
    }
  }

  test("collisions (width 2) only ever overestimate; state == batch sketch") {
    import spark.implicits._
    val rows = (0 until 600).map(i => ("s", s"k${i % 5}"))
    val fin = runStream(rows, width = 2, splits = Seq(0, 250))
    val exact = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    // CM guarantee: min over rows >= true count
    fin.foreach { case ((_, k), (_, est)) =>
      assert(est >= exact(k), s"$k underestimated: $est < ${exact(k)}")
    }
    // and the streaming estimates equal the BATCH aggregator's estimates
    // over the union (registers are sums -> identical state)
    val sketch = rows.map(_._2).toDF("k").as[String]
      .select(new HeavyHitters.CountMinAggregator(4, 2, 42L).toColumn)
      .head()
    fin.foreach { case ((_, k), (_, est)) =>
      val batchEst = HeavyHitters.estimate(sketch, k, 4, 2, 42L)
      assert(est == batchEst, s"$k: streaming $est != batch $batchEst")
    }
  }
}
