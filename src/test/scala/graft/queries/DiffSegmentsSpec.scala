package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the r13 gates d21 (soft dedup weights),
  * m14 (shot segmentation), p20 (snapshot diff rollup) on the sf0.001
  * fixture — the gate oracles pin cross-engine equality; these pin the
  * invariants a user relies on. */
class DiffSegmentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("d21: every doc weighted, cluster mass sums to ~1, singletons = 1") {
    val w = DedupQueries.all("d21_soft_dedup_weights")._1(spark, dir)
    val rows = w.collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs, "one weight per corpus document")
    rows.foreach { r =>
      val size = r.getLong(1); val weight = r.getDouble(2)
      assert(size >= 1, r.toString)
      assert(math.abs(weight - 1.0 / size) < 1e-6, r.toString)
    }
    assert(rows.exists(_.getLong(1) > 1), "fixture must contain a dup cluster")
    // each multi-member cluster's total sampling mass is ~1 (the policy)
    val mass = w.filter(col("cluster_size") > 1)
      .groupBy(col("cluster_size")).agg(sum(col("weight")).as("m"),
        count(lit(1)).as("n")).collect()
    mass.foreach { r =>
      val perCluster = r.getDouble(1) / (r.getLong(2).toDouble / r.getLong(0))
      assert(math.abs(perCluster - 1.0) < 1e-4,
        s"cluster of ${r.getLong(0)} should sum to 1, got $perCluster")
    }
  }

  test("m14: shots are contiguous, disjoint, and cover every frame") {
    val shots = MultimodalQueries.all("m14_shot_segments")._1(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(shots.nonEmpty)
    shots.groupBy(_._1).foreach { case (docId, ss) =>
      val ordered = ss.sortBy(_._2)
      // first shot opens at frame 0 with shot_id 1 (frame 0 is a keyframe)
      assert(ordered.head._2 == 1L && ordered.head._3 == 0L, ordered.head)
      // contiguity: n_frames == end - start + 1, next shot starts at end+1
      ordered.foreach { case (_, _, s, e, n) => assert(n == e - s + 1) }
      ordered.sliding(2).foreach {
        case Array((_, i1, _, e1, _), (_, i2, s2, _, _)) =>
          assert(i2 == i1 + 1 && s2 == e1 + 1, s"gap in doc $docId")
        case _ =>
      }
      // coverage: frames 0 .. (6 + docId % 7 - 1) are all assigned
      assert(ordered.map(_._5).sum == 6 + docId % 7, s"doc $docId coverage")
    }
  }

  test("p21: pruning is sound (never drops matches) and z-order wins") {
    // sf0.001's 1k events leave the 2-D box empty (0 files hit under
    // both layouts) — the win is only observable at sf0.01+
    val rows = PipelineQueries.all("p21_layout_pruning")
      ._1(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (lin, zo) = (rows("1_linear"), rows("2_zorder"))
    assert(lin._1 == 64 && zo._1 == 64)
    // soundness: a pruned file can contain NO matching row, so scanned
    // rows always cover the matches
    assert(lin._3 >= lin._4 && zo._3 >= zo._4)
    assert(lin._4 == zo._4, "same query, same matches under both layouts")
    // the point of the audit: clustering by the query dims scans
    // strictly fewer files than the linear layout
    assert(zo._2 < lin._2,
      s"z-order should prune more: zorder=${zo._2} linear=${lin._2}")
  }

  test("p22: constraint verdicts on planted nulls, dups, and orphans") {
    import spark.implicits._
    import graft.operators.QualityConstraints._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, 20.0, "b"), (3L, null, "c"), (4L, -5.0, "a"),
      (4L, 30.0, null)).toDF("k", "v", "s")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = check(df, Seq(
      Complete("c1_v_complete", "v", 1000000L),      // 4/5 non-null → fail
      Bounded("c2_v_nonneg", "v", 0.0, 100.0),       // -5.0 violates
      Unique("c3_k_unique", "k"),                    // 4 dup → fail
      Pattern("c4_s_lower", "s", "^[a-z]$", 1000000L), // nulls excluded → pass
      ContainedIn("c5_k_fk", "k", ref, "rk")))       // k=4 orphan (twice)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out("c1_v_complete") == (800000L, false))
    assert(out("c2_v_nonneg") == (1L, false))
    assert(out("c3_k_unique") == (800000L, false))
    assert(out("c4_s_lower") == (1000000L, true))
    assert(out("c5_k_fk") == (2L, false))
  }

  test("p20: rollup counts match the mutation rules computed directly") {
    val got = PipelineQueries.all("p20_snapshot_diff")._1(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val removed = o.filter(pmod(col("o_orderkey"), lit(97)) === 0).count()
    val changed = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0 &&
      pmod(col("o_orderkey"), lit(89)) === 0).count()
    val added = o.filter(pmod(col("o_orderkey"), lit(101)) === 0).count()
    assert(got.getOrElse("removed", 0L) == removed)
    assert(got.getOrElse("changed", 0L) == changed)
    assert(got.getOrElse("added", 0L) == added)
  }
}
