package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based connected-components correctness: on random undirected
  * edge lists, BOTH cluster algorithms — hash-min label propagation
  * ([[DedupClusters.connectedComponents]], O(diameter) rounds) and
  * Kiveris-et-al alternating star contraction
  * ([[DedupClusters.connectedComponentsStar]], O(log d) rounds) — must
  * produce exactly the driver union-find's (vertex → component minimum)
  * map. Random graphs cover the shapes the fixed specs can't enumerate:
  * chains (deep diameter), stars, multi-component forests, self-dup
  * edges, and the d12 oracle's clique-ish banding output. */
object CcProps extends Properties("dedup.cc") {

  // each sample runs two iterative Spark fixpoints; bound the samples
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    nodes <- Gen.chooseNum(2L, 25L)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, nodes), Gen.chooseNum(0L, nodes)))
  } yield rows.filter { case (a, b) => a != b }

  /** Driver union-find: vertex → its component's minimum vertex id. */
  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vs = edges.flatMap(e => List(e._1, e._2)).distinct
    // path-compress to the true minimum (union by min keeps roots minimal)
    vs.map(v => v -> find(v)).toMap
  }

  private def run(
      algo: (org.apache.spark.sql.DataFrame, String, String) =>
        org.apache.spark.sql.DataFrame,
      edges: List[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val rows = algo(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val m = rows.toMap
    // toMap must not mask a contradictory labeling (two labels for one
    // vertex would collapse to whichever row iterates last)
    require(rows.length == m.size,
      s"non-functional labeling: ${rows.length} rows, ${m.size} vertices")
    m
  }

  property("hash-min == union-find component minima") =
    Prop.forAll(genEdges) { edges =>
      edges.isEmpty ||
        run(DedupClusters.connectedComponents(_, _, _), edges) ==
          unionFind(edges)
    }

  property("star contraction == union-find component minima") =
    Prop.forAll(genEdges) { edges =>
      edges.isEmpty ||
        run(DedupClusters.connectedComponentsStar(_, _, _), edges) ==
          unionFind(edges)
    }
}
