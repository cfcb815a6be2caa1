package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based as-of join correctness: against random (key, ts) data,
  * [[AsOfJoin.backward]]/[[AsOfJoin.forward]] must agree with the naive
  * per-row definition (scan all right rows, pick nearest at-or-before /
  * at-or-after within the key) — the O(|L|·|R|) semantics the scalable
  * union+window plan must never deviate from. */
object AsOfJoinProps extends Properties("asof.join") {

  // each sample runs two Spark jobs; keep the sample count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genKey = Gen.oneOf("a", "b", "c", "d")
  private val genTs = Gen.chooseNum(0L, 40L)

  private val genLeft: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(n, Gen.zip(genKey, genTs))
  } yield rows.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }

  private val genRight: Gen[List[(String, Long, String)]] = for {
    n <- Gen.chooseNum(0, 25)
    rows <- Gen.listOfN(n, Gen.zip(genKey, genTs))
  } yield rows.distinct // unique (key, ts): the operator's contract
    .map { case (k, ts) => (k, ts, s"$k@$ts") }

  property("backward == naive nearest-at-or-before") =
    Prop.forAll(genLeft, genRight) { (ls, rs) =>
      import spark.implicits._
      val left = ls.toDF("k", "ts", "id")
      val right = rs.toDF("k", "rts", "rv")
      val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts")
        .select("id", "rv").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val expect = ls.flatMap { case (k, ts, id) =>
        rs.filter { case (rk, rts, _) => rk == k && rts <= ts }
          .sortBy(_._2).lastOption.map { case (_, _, rv) => (id, rv) }
      }.toSet
      got == expect
    }

  property("forward == naive nearest-at-or-after") =
    Prop.forAll(genLeft, genRight) { (ls, rs) =>
      import spark.implicits._
      val left = ls.toDF("k", "ts", "id")
      val right = rs.toDF("k", "rts", "rv")
      val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts")
        .select("id", "rv").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val expect = ls.flatMap { case (k, ts, id) =>
        rs.filter { case (rk, rts, _) => rk == k && rts >= ts }
          .sortBy(_._2).headOption.map { case (_, _, rv) => (id, rv) }
      }.toSet
      got == expect
    }

  // ScalaCheck Properties has no afterAll: properties run in registration
  // order, so this last "property" tears the session down. Leaving the
  // local[2] session alive would hand it (via getOrCreate) to whatever
  // suite runs next in the shared test JVM — e.g. a suite expecting its
  // own extensions or parallelism.
  property("zz (teardown: stop the shared session)") = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    Prop.passed
  }
}
