package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for [[Graph]] on small hand-checkable graphs, plus an
  * exact cross-check of the fixed-point PageRank against a naive
  * in-memory replica of the SAME integer semantics — the distributed
  * plan must reproduce the scalar loop bit-for-bit. */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Scalar replica of Graph.pageRank's integer semantics. */
  private def naivePageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = (scale * 15L) / 100L
    var ranks = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inMass = e.groupBy(_._2).view.mapValues { in =>
        in.map { case (src, _) => ranks(src) / outdeg(src) }.sum
      }.toMap
      ranks = nodes.map(n => n -> (base + (85L * inMass.getOrElse(n, 0L)) / 100L)).toMap
    }
    ranks
  }

  private def runPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank: symmetric 2-cycle is uniform at the stationary value") {
    // each node forwards its whole rank to the other: r = 150000 + 85%·r
    // converges toward scale; after any round both nodes are equal
    val got = runPageRank(Seq((1L, 2L), (2L, 1L)), 5)
    assert(got(1L) == got(2L))
    assert(got == naivePageRank(Seq((1L, 2L), (2L, 1L)), 5))
  }

  test("pageRank: hub of a symmetric star outranks the leaves") {
    val star = (2L to 6L).flatMap(l => Seq((1L, l), (l, 1L)))
    val got = runPageRank(star, 5)
    assert((2L to 6L).forall(l => got(1L) > got(l)))
    assert((2L to 6L).map(got).distinct.size == 1) // leaves symmetric
    assert(got == naivePageRank(star, 5))
  }

  test("pageRank: matches the naive integer loop on an irregular digraph") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L),
      (5L, 4L), (5L, 1L), (2L, 4L), (6L, 6L) // self-loop + dangling-ish mix
    )
    for (iters <- Seq(1, 3, 5, 8)) {
      assert(runPageRank(edges, iters) == naivePageRank(edges, iters),
        s"iters=$iters")
    }
  }

  test("pageRank over PreparedEdges equals the one-shot entry points " +
    "(shared-prep path is bit-identical)") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L),
      (5L, 4L), (5L, 1L), (2L, 4L), (1L, 2L)) // dup edge: distinct applies
    val prepared = Graph.prepareEdges(edges.toDF("src", "dst"), "src", "dst")
    val pr = Graph.pageRankPrepared(prepared, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == naivePageRank(edges, 5))
    // the SAME prepared instance serves the personalized variant too —
    // exactly how g01/g03 share the trade graph
    val ppr = Graph.personalizedPageRankPrepared(prepared,
        Seq(1L, 4L).toDF("node"), "node", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == naivePpr(edges, Set(1L, 4L), 5))
  }

  test("pageRank: dangling sink keeps receiving but stops re-emitting") {
    // 1 -> 2 only: node 2 has no out-edges; documented no-redistribute
    val got = runPageRank(Seq((1L, 2L)), 5)
    assert(got == naivePageRank(Seq((1L, 2L)), 5))
    assert(got(2L) > got(1L)) // sink accumulates 1's mass
  }

  /** Scalar replica of personalizedPageRank's integer semantics. */
  private def naivePpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int, scale: Long = 1000000L): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = (scale * 15L) / 100L
    var ranks = nodes.map(n => n -> (if (seeds(n)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val inMass = e.groupBy(_._2).view.mapValues { in =>
        in.map { case (src, _) => ranks(src) / outdeg(src) }.sum
      }.toMap
      ranks = nodes.map(n => n ->
        ((if (seeds(n)) base else 0L) + (85L * inMass.getOrElse(n, 0L)) / 100L)).toMap
    }
    ranks
  }

  test("personalizedPageRank: matches naive loop; non-reachable nodes stay 0") {
    import spark.implicits._
    // two components: {1,2,3} cyclic (seeded at 1), {10,11} (unseeded)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L),
      (10L, 11L), (11L, 10L))
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", Seq(1L).toDF("node"), "node", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naivePpr(edges, Set(1L), 5))
    assert(got(10L) == 0L && got(11L) == 0L)
    assert(got(1L) > got(2L) && got(2L) > 0L && got(3L) > 0L)
  }

  test("personalizedPageRank: seeding every node equals uniform pageRank") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L))
    val nodes = Seq(1L, 2L, 3L)
    val ppr = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", nodes.toDF("node"), "node", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == naivePageRank(edges, 4))
  }

  /** Scalar replica of kCore's fixed-round peeling semantics. */
  private def naiveKCore(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, (Boolean, Long)] = {
    val sym0 = edges.filter(e => e._1 != e._2)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nodes = sym0.map(_._1).distinct
    var sym = sym0
    for (_ <- 1 to rounds) {
      val deg = sym.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      sym = sym.filter { case (a, b) => keep(a) && keep(b) }
    }
    val cd = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    nodes.map(n => n -> (cd.contains(n), cd.getOrElse(n, 0L))).toMap
  }

  test("kCore: cycles survive the 2-core, chains and pendants peel away") {
    import spark.implicits._
    // triangle {1,2,3} + chain 3-4-5 + pendant 1-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (1L, 9L))
    val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", 2, 6)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap
    assert(got == naiveKCore(edges, 2, 6))
    assert(got(1L) == (true, 2L) && got(2L) == (true, 2L) && got(3L) == (true, 2L))
    assert(!got(4L)._1 && !got(5L)._1 && !got(9L)._1)
  }

  test("kCore: matches naive peeling on an irregular graph at several k") {
    import spark.implicits._
    val edges = (for (a <- 1L to 14L; b <- (a + 1) to 14L
      if (a * 13 + b * 29) % 4 == 0) yield (a, b)).toSeq
    for (k <- Seq(2, 3)) {
      val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, 8)
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
        .toMap
      assert(got == naiveKCore(edges, k, 8), s"k=$k")
    }
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: K4 plus a pendant path") {
    // K4 on {1,2,3,4}: each node is in C(3,2) = 3 triangles; pendant
    // chain 4-5-6 adds none
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = runTriangles(k4 ++ Seq((4L, 5L), (5L, 6L)))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L, 6L -> 0L))
  }

  test("triangleCounts: duplicate/reversed/self edges canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 2L), (1L, 3L))
    assert(runTriangles(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: matches naive enumeration on a random-ish graph") {
    // deterministic pseudo-random graph over 12 nodes
    val edges = (for (a <- 1L to 12L; b <- (a + 1) to 12L
      if (a * 31 + b * 17) % 3 == 0) yield (a, b)).toSeq
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naive = (1L to 12L).map { n =>
      val nb = adj.getOrElse(n, Set.empty).toSeq
      n -> nb.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
        case _ => false
      }.toLong
    }.filter { case (n, _) => adj.contains(n) }.toMap
    assert(runTriangles(edges) == naive)
  }

  // ------------------------------------------------------- labelPropagation

  /** Scalar replica of Graph.labelPropagation's synchronous min-label
    * semantics. */
  private def naiveLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = sym.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        val votes = adj(n).map(lab).groupBy(identity).view.mapValues(_.size)
        val mc = votes.values.max
        n -> votes.filter(_._2 == mc).keys.min
      }.toMap
    }
    lab
  }

  private def runLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation: bridged triangles settle into two communities") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), // triangle A
      (4L, 5L), (4L, 6L), (5L, 6L), // triangle B
      (3L, 4L)) // bridge
    val got = runLpa(edges, 4)
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L), s"bridge should not merge communities: $got")
    assert(got == naiveLpa(edges, 4))
  }

  test("labelPropagation: a clique collapses to its min label") {
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = runLpa(clique.toSeq, 4)
    assert(got.values.toSet == Set(1L), s"clique should agree on 1: $got")
  }

  test("labelPropagation: matches the naive synchronous loop exactly") {
    val edges = (for (a <- 1L to 14L; b <- (a + 1) to 14L
      if (a * 13 + b * 7) % 4 == 0) yield (a, b)).toSeq
    for (r <- 1 to 4)
      assert(runLpa(edges, r) == naiveLpa(edges, r), s"diverged at round $r")
  }

  // ---------------------------------------------------- commonNeighborPairs

  private def runCn(edges: Seq[(Long, Long)],
      cap: Long = 10000L): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Graph.commonNeighborPairs(edges.toDF("src", "dst"), "src", "dst", cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
  }

  test("commonNeighborPairs: path predicts its endpoints") {
    // 1-2-3: (1,3) share {2}; deg(1)=deg(3)=1 so Jaccard = 1/1
    assert(runCn(Seq((1L, 2L), (2L, 3L))) == Set((1L, 3L, 1L, 1L, 1000L)))
  }

  test("commonNeighborPairs: square predicts both diagonals") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    // each diagonal shares BOTH off-diagonal nodes: common 2, union 2
    assert(runCn(sq) == Set((1L, 3L, 2L, 2L, 1000L), (2L, 4L, 2L, 2L, 1000L)))
  }

  test("commonNeighborPairs: adjacent pairs are never predicted") {
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(runCn(triangle).isEmpty)
  }

  test("commonNeighborPairs: pivotDegCap silences hub-mediated wedges") {
    val star = (1L to 5L).map(l => (0L, l))
    // uncapped: the hub pivots C(5,2) leaf pairs, each 1/1 Jaccard
    assert(runCn(star).size == 10)
    // capped below the hub degree: leaves (degree 1) generate no wedges
    assert(runCn(star, cap = 4L).isEmpty)
  }

  test("kTruss: keeps triangle-corroborated edges, peels chains and tails") {
    import spark.implicits._
    def truss(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] =
      Graph.kTruss(edges.toDF("src", "dst"), "src", "dst", k = 3, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // triangle + pendant tail: the three triangle edges survive with
    // support 1; the tail edge (3,4) is in no triangle and peels
    val t1 = truss(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(t1 == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L), t1)
    // two triangles sharing edge (2,3): the shared edge has support 2
    val bow = truss(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(bow((2L, 3L)) == 2L, bow.toString)
    assert(bow.size == 5 && bow.count(_._2 == 1L) == 4, bow.toString)
    // path edge attached to a triangle vertex pair: (2,3) touches the
    // triangle {1,3,4} only through vertex 3, has no common neighbor
    // with its other endpoint, and peels; the triangle's edges survive
    val sq = truss(Seq((2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)))
    assert(sq.keySet == Set((3L, 4L), (1L, 4L), (1L, 3L)), sq.toString)
  }

  test("modularity: two triangles + bridge matches the textbook value") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3–4: m = 7.
    // Perfect split: e_c = 3, d_c = 7 each →
    // Q_c = 3/7 − (7/14)² = 0.178571…, Q = 2·Q_c = 0.357142…
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("s", "d")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val out = Graph.modularity(edges, "s", "d", labels)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // m2 = 14; per community: q_num = i_c·m2 − d_c² = 6·14 − 49 = 35,
    // q_micro = 35e6 div 196 = 178571
    assert(out(10L) == (3L, 3L, 7L, 35L, 178571L), out.toString)
    assert(out(20L) == (3L, 3L, 7L, 35L, 178571L), out.toString)
    // everyone in ONE community: i = 14 (all edges internal), d_c = 2m
    // = 14 → q_num = 14·14 − 196 = 0 — whole-graph community scores 0
    val one = labels.select($"node",
      org.apache.spark.sql.functions.lit(1L).as("community"))
    val all1 = Graph.modularity(edges, "s", "d", one).collect()
    assert(all1.length == 1)
    val r = all1.head
    assert((r.getLong(4), r.getLong(5)) == (0L, 0L), r.toString)
    // a singleton split of node 3 out of its triangle goes NEGATIVE for
    // the singleton: i = 0, d = 3 → q_num = −9
    val split = labels.withColumn("community",
      org.apache.spark.sql.functions.when($"node" === 3L, 99L)
        .otherwise($"community"))
    val neg = Graph.modularity(edges, "s", "d", split)
      .collect().map(x => x.getLong(0) -> (x.getLong(4), x.getLong(5)))
      .toMap
    // −9e6 div 196 truncates toward zero (both engines): −45918
    assert(neg(99L) == (-9L, -45918L), neg.toString)
  }

  test("assortativity: star hits −1 exactly; regular graph is NULL") {
    import spark.implicits._
    // star (hub 0, leaves 1-3): S1=6, Σj=12, Σjk=18, Σj²=30 →
    // r = (6·18−144)/(6·30−144) = −36/36 = −1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val r1 = Graph.assortativity(star, "s", "d").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4)) == (6L, 12L, 18L, 30L, -1000000L), r1.toString)
    // a 4-cycle is 2-regular: zero variance → NULL, not a crash
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val r2 = Graph.assortativity(cyc, "s", "d").collect().head
    assert(r2.isNullAt(4), r2.toString)
  }

  test("degreeAudit: bit-length buckets and endpoint shares are exact") {
    import spark.implicits._
    // star: hub 0 with 5 leaves → hub deg 5 (bucket 3), leaves deg 1
    // (bucket 1); endpoints total 10
    val edges = (1L to 5L).map(l => (0L, l)).toDF("s", "d")
    val out = Graph.degreeAudit(edges, "s", "d")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(out == Map(
      1L -> (5L, 1L, 1L, 5L, 500000L),
      3L -> (1L, 5L, 5L, 5L, 500000L)), out.toString)
  }

  test("multiSourceBfs: exact hop distances on a path + unreached absent") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7, plus isolated edge 100-101
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (100L, 101L)).toDF("s", "d")
    val out = Graph.multiSourceBfs(edges, "s", "d", seeds = Seq(1L),
      rounds = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), out.toString)
    // two sources: min distance wins; seeds report 0 even when absent
    // from the edge list
    val multi = Graph.multiSourceBfs(edges, "s", "d",
      seeds = Seq(1L, 7L, 999L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      7L -> 0L, 6L -> 1L, 5L -> 2L, 999L -> 0L), multi.toString)
  }

  test("harmonicCentrality: path graph matches hand-summed 1/d scores") {
    import spark.implicits._
    // path 1-2-3-4-5; landmarks {1, 5}, 4 rounds reach everything
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val out = Graph.harmonicCentrality(edges, "s", "d",
      seeds = Seq(1L, 5L), rounds = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      // node -> (reached, Σ⌊10⁶/d⌋); a seed's own d=0 contributes nothing
      1L -> ((1L, 250000L)),           // from 5: d=4
      2L -> ((2L, 1333333L)),          // d=1 and d=3
      3L -> ((2L, 1000000L)),          // d=2 twice
      4L -> ((2L, 1333333L)),          // d=3 and d=1
      5L -> ((1L, 250000L))),          // from 1: d=4
      out.toString)
    // round truncation: with 2 rounds node 4 only sees landmark 5,
    // and a node outside every landmark's radius is absent
    val trunc = Graph.harmonicCentrality(edges, "s", "d",
      seeds = Seq(1L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(trunc == Map(2L -> 1000000L, 3L -> 500000L), trunc.toString)
  }

  test("localClustering: triangle + pendant matches hand values") {
    import spark.implicits._
    // triangle {1,2,3} with a pendant 4 off node 3; duplicate and
    // reversed edges must collapse in canonicalization
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 4L))
      .toDF("s", "d")
    val out = Graph.localClustering(edges, "s", "d")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      1L -> ((2L, 1L, 1000000L)), // 2*1/(2*1) = 1
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)),  // 2*1/(3*2) = 1/3, floor micro
      4L -> ((1L, 0L, 0L))),      // deg < 2 -> defined as 0
      out.toString)
  }

  test("richClub: path graph hand values, thresholds with empty clubs") {
    import spark.implicits._
    // path 1-2-3-4: deg(1)=deg(4)=1, deg(2)=deg(3)=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val out = Graph.richClub(edges, "s", "d", Seq(0L, 1L, 2L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 4L, 3L, 500000L),  // all 4 nodes, 3 of 6 possible edges
      (1L, 2L, 1L, 1000000L), // {2,3} connected: phi = 1
      (2L, 0L, 0L, -1L)),     // empty club -> NULL phi
      out.mkString(","))
  }

  test("ballGrowth: path graph coverage curve from two landmarks") {
    import spark.implicits._
    // path 1-2-3-4, seeds {1,4}, 2 rounds: dist-0 pairs = 2 (seeds),
    // dist-1 = 2 (1->2, 4->3), dist-2 = 2 (1->3, 4->2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val out = Graph.ballGrowth(edges, "s", "d", Seq(1L, 4L), rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 333333L),
      (1L, 2L, 4L, 666666L),
      (2L, 2L, 6L, 1000000L)),
      out.mkString(","))
  }

  test("neighborDegreeCurve: star graph hand values, duplicate edges " +
    "collapse") {
    import spark.implicits._
    // star: center 0 — leaves 1,2,3 (one edge duplicated + reversed)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L))
      .toDF("s", "d")
    val out = Graph.neighborDegreeCurve(edges, "s", "d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3000000L),  // leaves: their one neighbor has degree 3
      (3L, 1L, 1000000L)), // center: neighbors all degree 1
      out.mkString(","))
  }
}
