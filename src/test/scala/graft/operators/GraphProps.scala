package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based correctness for the r13 graph/layout operators against
  * naive reference implementations on random inputs: modularity vs the
  * textbook per-community formula, multi-source BFS vs a queue BFS, and
  * rendezvous sharding vs a per-key argmax loop. */
object GraphProps extends Properties("graph.r13") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 12L)))
  } yield rows

  property("modularity q_num == textbook per-community formula") =
    Prop.forAll(genEdges, Gen.chooseNum(2, 4)) { (es, nComm) =>
      import spark.implicits._
      val sym = es.filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      (sym.nonEmpty) ==> {
        val comm = (n: Long) => n % nComm
        val labels = sym.map(_._1).distinct
          .map(n => (n, comm(n))).toDF("node", "community")
        val got = Graph.modularity(es.toDF("s", "d"), "s", "d", labels)
          .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
        val m2 = sym.size.toLong
        val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val expect = sym.map(_._1).distinct.map(comm).distinct.map { c =>
          val ic = sym.count { case (a, b) => comm(a) == c && comm(b) == c }
          val dc = deg.collect { case (n, d) if comm(n) == c => d }.sum
          c -> (ic * m2 - dc * dc)
        }.toMap
        got == expect
      }
    }

  property("multiSourceBfs == queue BFS truncated at `rounds` hops") =
    Prop.forAll(genEdges, Gen.chooseNum(1, 4)) { (es, rounds) =>
      import spark.implicits._
      val adj = es.filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val seeds = Seq(0L, 5L)
      val got = Graph.multiSourceBfs(es.toDF("s", "d"), "s", "d",
        seeds, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var dist = seeds.map(_ -> 0L).toMap
      for (r <- 1 to rounds) {
        val frontier = dist.collect { case (n, d) if d == r - 1 => n }
        frontier.foreach { n =>
          adj.getOrElse(n, Nil).foreach { m =>
            if (!dist.contains(m)) dist += (m -> r.toLong)
          }
        }
      }
      got == dist
    }

  property("rendezvousShard == per-key driver argmax; N→N+1 moves only " +
    "into the new shard") =
    Prop.forAll(Gen.chooseNum(1, 40), Gen.chooseNum(2, 6)) { (nKeys, n) =>
      import spark.implicits._
      // the minimal-disruption law IS rendezvous hashing's definition:
      // every key's shard either survives growth or moves to the new
      // shard — never between two old shards — at every (keys, N) pair
      val keys = (0L until nKeys.toLong).toDF("doc_id")
      val a = Layout.rendezvousShard(keys, "doc_id", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Layout.rendezvousShard(keys, "doc_id", n + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val inRange = a.values.forall(s => s >= 0 && s < n) &&
        b.values.forall(s => s >= 0 && s <= n)
      val onlyIntoNew = a.keys.forall(k => a(k) == b(k) || b(k) == n.toLong)
      inRange && onlyIntoNew && a.size == nKeys && b.size == nKeys
    }
}
