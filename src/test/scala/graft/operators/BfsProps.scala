package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based BFS correctness: on random undirected graphs (uniform
  * edge soups, chains, stars, forests of both), the distributed min-union
  * landmark BFS ([[Graph.minUnionBfs]] — the primitive under g13 harmonic
  * centrality and g15 ball growth) must produce exactly the driver BFS's
  * (node, src, dist) triples truncated at `rounds`, for random seed sets
  * and round budgets; and [[Graph.multiSourceBfs]] must equal its min
  * over sources. Chains exercise deep frontiers, stars wide ones,
  * forests unreachable components (absent rows, not nulls). */
object BfsProps extends Properties("graph.bfs") {

  // each sample runs a multi-round Spark fixpoint; bound the samples
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genSoup: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    nodes <- Gen.chooseNum(2L, 25L)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, nodes), Gen.chooseNum(0L, nodes)))
  } yield rows

  private val genChain: Gen[List[(Long, Long)]] = for {
    len <- Gen.chooseNum(2L, 15L)
    off <- Gen.chooseNum(0L, 5L)
  } yield (0L until len).map(i => (off + i, off + i + 1)).toList

  private val genStar: Gen[List[(Long, Long)]] = for {
    leaves <- Gen.chooseNum(2L, 12L)
    hub <- Gen.chooseNum(0L, 3L)
  } yield (1L to leaves).map(l => (hub, hub + l)).toList

  private val genForest: Gen[List[(Long, Long)]] = for {
    a <- Gen.oneOf(genChain, genStar)
    b <- Gen.oneOf(genChain, genStar)
  } yield a ++ b.map { case (u, v) => (u + 100L, v + 100L) }

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.oneOf(genSoup, genChain, genStar, genForest)

  private val genCase: Gen[(List[(Long, Long)], List[Long], Int)] = for {
    edges <- genEdges
    nodes = edges.flatMap(e => List(e._1, e._2)).distinct
    if nodes.nonEmpty
    k <- Gen.chooseNum(1, math.min(3, nodes.size))
    seeds <- Gen.pick(k, nodes)
    rounds <- Gen.chooseNum(1, 4)
  } yield (edges, seeds.toList, rounds)

  /** Driver truth: per-seed BFS over the symmetrized self-loop-free
    * graph, truncated at `rounds` hops — (node, src) → dist. Seeds
    * always carry their own (seed, seed, 0) row, reachable or not. */
  private def driverBfs(edges: List[(Long, Long)], seeds: List[Long],
      rounds: Int): Map[(Long, Long), Long] = {
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => List(e, e.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    seeds.distinct.flatMap { s =>
      val dist = scala.collection.mutable.Map[Long, Long](s -> 0L)
      var frontier = List(s)
      for (d <- 1 to rounds) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains).distinct
        frontier.foreach(n => dist(n) = d.toLong)
      }
      dist.map { case (n, d) => (n, s) -> d }
    }.toMap
  }

  property("minUnionBfs == driver per-landmark BFS truncated at rounds") =
    Prop.forAll(genCase) { case (edges, seeds, rounds) =>
      import spark.implicits._
      val got = Graph.minUnionBfs(edges.toDF("a", "b"), "a", "b",
          seeds, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      val m = got.toMap
      require(got.length == m.size,
        s"duplicate (node, src) rows: ${got.length} vs ${m.size}")
      m == driverBfs(edges, seeds, rounds)
    }

  property("multiSourceBfs == min over sources of the landmark BFS") =
    Prop.forAll(genCase) { case (edges, seeds, rounds) =>
      import spark.implicits._
      val got = Graph.multiSourceBfs(edges.toDF("a", "b"), "a", "b",
          seeds, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = driverBfs(edges, seeds, rounds).toSeq
        .groupBy(_._1._1).view.mapValues(_.map(_._2).min).toMap
      got == want
    }
}
