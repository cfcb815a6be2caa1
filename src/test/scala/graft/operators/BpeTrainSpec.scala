package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Iterated BPE training (t25) against a straight-line reference trainer
  * (the classic Sennrich algorithm written the obvious driver-side way):
  * merge choice (cnt DESC, pair ASC), greedy left-to-right application,
  * and the overlap conventions must agree round for round. */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Classic BPE trainer over a word multiset: returns the ordered merge
    * list as (pair "a b", cnt). */
  private def refTrain(words: Seq[String], merges: Int): Seq[(String, Long)] = {
    var wf: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.split("").toVector -> ws.size.toLong }
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    for (_ <- 0 until merges) {
      val pc = mutable.Map.empty[(String, String), Long]
      wf.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f)
      }
      if (pc.nonEmpty) {
        val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) =>
          (-c, s"$x $y")
        }
        out += ((s"$a $b", cnt))
        wf = wf.toSeq.map { case (syms, f) =>
          val ns = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              ns += a + b; i += 2
            } else { ns += syms(i); i += 1 }
          }
          ns.toVector -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def engineTrain(words: Seq[String],
      merges: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    val df = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    TextAnalysis.bpeTrain(df, "text", merges).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("matches the reference trainer on the classic corpus") {
    // Sennrich's running example shape: shared stems, productive suffixes
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq.fill(4)("new")
    val want = refTrain(corpus, 8)
    val got = engineTrain(corpus, 8)
    assert(got.map(t => (t._2, t._4)) == want,
      s"got=$got\nwant=$want")
    assert(got.map(_._1) == (0L until 8L), "merge_idx is the round order")
    got.foreach { case (_, pair, tok, _) =>
      assert(tok == pair.replace(" ", ""), s"$pair -> $tok")
    }
  }

  test("greedy left-to-right overlap: aaa -> (aa, a); aaaa -> (aa, aa)") {
    // one merge of (a, a) over words of repeated a's — the overlap
    // convention is where naive replace implementations diverge
    val corpus = Seq.fill(7)("aaa") ++ Seq.fill(2)("aaaa") ++ Seq.fill(9)("ab")
    val want = refTrain(corpus, 3)
    val got = engineTrain(corpus, 3)
    assert(got.map(t => (t._2, t._4)) == want, s"got=$got\nwant=$want")
    // round 0 must be (a a): aaa contributes 2·7, aaaa contributes 3·2 = 20
    assert(got.head._2 == "a a" && got.head._4 == 20L)
    // after the merge, 'aa a' (from aaa) and 'aa aa' (from aaaa) exist:
    // the reference computes the same follow-up counts
  }

  test("a symbol whose text collides with a neighbor boundary cannot " +
      "false-match (delimiter encoding)") {
    // merged symbol "ab" next to "c": the spaced encoding ' ab  c ' must
    // not let a later merge (b, c) match inside it
    val corpus = Seq.fill(10)("abc") ++ Seq.fill(6)("bc")
    val want = refTrain(corpus, 4)
    val got = engineTrain(corpus, 4)
    assert(got.map(t => (t._2, t._4)) == want, s"got=$got\nwant=$want")
  }

  test("encode applies trained merges: counts and compression are exact") {
    import spark.implicits._
    // wf: aa×2, ab×1 → merge0 = (a a)→aa (cnt 2), merge1 = (a b)→ab
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", merges = 2)
    val full = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text",
      merges, 2).collect().head
    // all three words collapse to single tokens: 3 words, 6 chars,
    // 3 tokens, compression 3e6 div 6 = 500000
    assert((full.getLong(1), full.getLong(2), full.getLong(3),
      full.getLong(4)) == (3L, 6L, 3L, 500000L), full.toString)
    // applying only merge 0 leaves "ab" unmerged: 4 tokens
    val one = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text",
      merges, 1).collect().head
    assert(one.getLong(3) == 4L, one.toString)
  }

  test("encode degrades gracefully when the merge list is shorter than " +
    "nMerges (exhausted trainer)") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", merges = 2)
    // asking for 5 rounds with a 2-round list: rounds 2-4 are no-ops —
    // the result equals the 2-round encode (pre-fix, the empty rounds'
    // cross joins silently EMPTIED the whole result)
    val want = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text",
      merges, 2).collect().map(_.toSeq).toSeq
    val got = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text",
      merges, 5).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want, s"got $got want $want")
  }
}
