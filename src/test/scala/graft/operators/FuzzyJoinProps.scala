package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based fuzzy-join correctness: against random short strings,
  * [[Dedup.editDistance1Pairs]] must agree exactly with the naive
  * all-pairs definition (every id pair whose levenshtein distance is
  * ≤ 1) — deletion-neighborhood banding is an OPTIMIZATION, never a
  * recall trade at distance 1. The small alphabet forces collisions:
  * exact duplicates, deletions, substitutions, and near-misses at
  * distance 2 all occur. */
object FuzzyJoinProps extends Properties("fuzzy.join") {

  // each sample runs two Spark jobs; keep the sample count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genStr: Gen[String] = for {
    n <- Gen.chooseNum(0, 5)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val genRows: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(0, 20)
    ss <- Gen.listOfN(n, genStr)
  } yield ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("pairs == naive all-pairs levenshtein <= 1") =
    Prop.forAll(genRows) { rows =>
      import spark.implicits._
      val df = rows.toDF("id", "s")
      val got = Dedup.editDistance1Pairs(df, "id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // the operator drops null/empty keys by contract
      val alive = rows.filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- alive; (ib, sb) <- alive if ia < ib
        d = lev(sa, sb) if d <= 1
      } yield (ia, ib, d)).toSet
      Prop(got == want) :| s"got=$got want=$want rows=$rows"
    }
}
