package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftHash, TextExpressions, VectorFunctions}

/** Ground-truth tests for the LLM-pipeline operators on small controlled
  * data (the oracle gate covers the SQL-expressible ones end-to-end). */
class LlmOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (3L, "completely different content about spark query engines and columnar execution"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (5L, "")
    ).toDF("doc_id", "text")
  }

  test("fnv1a64 matches reference vectors and is codegen-stable") {
    // Known FNV-1a test vectors (public): fnv1a64("") = 0xcbf29ce484222325
    assert(GraftHash.fnv1a64(Array.empty[Byte]) == 0xcbf29ce484222325L)
    // "a" -> 0xaf63dc4c8601ec8c
    assert(GraftHash.fnv1a64("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    import spark.implicits._
    val viaSpark = Seq("", "a", "hello world").toDF("s")
      .select(TextExpressions.fnv1a64(col("s")).as("h")).collect().map(_.getLong(0))
    assert(viaSpark(0) == 0xcbf29ce484222325L)
    assert(viaSpark(1) == 0xaf63dc4c8601ec8cL)
    assert(viaSpark(2) == GraftHash.fnv1a64("hello world".getBytes("UTF-8")))
  }

  test("exact dedup finds the exact duplicate only") {
    val out = Dedup.exactCanonical(docsDf, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(out.head.fieldIndex("canonical_id")) == 1L)
    assert(out.head.getLong(out.head.fieldIndex("n_copies")) == 2L)
  }

  test("duplicateSpans finds maximal duplicated word spans") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),       // span source
      (2L, "y1 y2 w1 w2 w3 w4 w5 w6 w7 w8 y3"),    // same 8-word span at offset 3
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),       // exact copy of doc 1
      (4L, "z1 z2")                                 // below the gram floor
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", gramLen = 4)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1 and 3 duplicate entirely (span covers all 10 words); doc 2
    // shares only the 8-word w-run; doc 4 has no grams at all
    assert(spans.toSeq == Seq((1L, 1L, 10L), (2L, 3L, 8L), (3L, 1L, 10L)))
  }

  test("substringDedup keeps the canonical occurrence and cleans the rest") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),
      (2L, "y1 y2 w1 w2 w3 w4 w5 w6 w7 w8 y3"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),
      (4L, "z1 z2")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", gramLen = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"), // canonical sites: untouched
      (2L, 8L, "y1 y2 y3"),                      // span removed, frame kept
      (3L, 10L, ""),                             // whole doc was a copy
      (4L, 0L, "z1 z2")))                        // below floor: untouched
  }

  test("connectedComponents closes multi-hop chains to one cluster") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, NOT a clique), separate pair 10-11, and
    // a triangle 20-21-22 — labels must be the component-min everywhere
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val out = DedupClusters.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("substring dedup rejects doc ids outside the 40-bit packing range") {
    import spark.implicits._
    // the (doc_id, position) → long packing is only order-preserving inside
    // its documented 40/23-bit split; an id past the bound must fail the job
    // loudly instead of silently mis-picking canonical sites
    val bigId = 1L << 39
    val df = Seq(
      (bigId, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8")
    ).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.substringDedup(df, "doc_id", "text", gramLen = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packing overflow")), msgs(e).toString)

    // ids inside the bound — including negative ones — still work
    val ok = Seq((-5L, "w1 w2 w3 w4 w5 w6"), (7L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(ok, "doc_id", "text", gramLen = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // canonical site is the (doc_id, pos)-minimum: doc -5 keeps its text,
    // doc 7 (an exact copy) is fully cleaned
    assert(out.toSeq == Seq(
      (-5L, 0L, "w1 w2 w3 w4 w5 w6"), (7L, 6L, "")))
  }

  test("star-contraction CC: deep chain in O(log d) rounds, random graph parity") {
    import spark.implicits._
    // 64-node chain (diameter 63): hash-min needs 64 rounds; star
    // contraction must land it in ≤ 10
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val starLabels = DedupClusters.connectedComponentsStar(
      chain, "id_a", "id_b", maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(starLabels.size == 64 && starLabels.values.forall(_ == 1L),
      s"chain must collapse to one component: $starLabels")

    // random graph: same components as hash-min
    val rnd = new scala.util.Random(11)
    val edges = (0 until 120).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val viaStar = DedupClusters.connectedComponentsStar(edges, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaHashMin = DedupClusters.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStar == viaHashMin,
      s"star and hash-min disagree: ${viaStar.toSeq.diff(viaHashMin.toSeq)}")
  }

  test("connectedComponents fails loudly when maxIter exhausts unconverged") {
    import spark.implicits._
    // chain 1-2-3-4 has diameter 3: one hash-min round cannot converge, so
    // a silent return here would hand back over-split clusters that LOOK
    // valid — the operator must throw instead
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val e = intercept[org.apache.spark.SparkException] {
      DedupClusters.connectedComponents(edges, "id_a", "id_b", maxIter = 1)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("edit-distance-1 fuzzy join: deletions, substitutions, exact dups") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark"),
      (2L, "spark"),   // exact dup        → dist 0
      (3L, "sprk"),    // deletion of 'a'  → dist 1 vs 1/2
      (4L, "spork"),   // substitution a→o → dist 1 vs 1/2 (shared deletion "sprk")
      (5L, "sparkly"), // dist 2: must NOT pair with spark
      (6L, "zzz")      // unrelated
    ).toDF("id", "name")
    val got = Dedup.editDistance1Pairs(df, "id", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got == Map(
      (1L, 2L) -> 0,
      (1L, 3L) -> 1, (2L, 3L) -> 1,
      (1L, 4L) -> 1, (2L, 4L) -> 1,
      (3L, 4L) -> 1), got.toString)
    // single-char strings and empties don't crash the neighborhood
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "")).toDF("id", "name")
    val t = Dedup.editDistance1Pairs(tiny, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // "a" and "b" share the empty-string deletion variant → dist 1
    assert(t.toSeq == Seq((1L, 2L, 1)))
  }

  test("edit-distance-1 fuzzy join: planted 10^4-copy hot key stays sub-quadratic") {
    import spark.implicits._
    // a web-scale failure mode: 10^4 identical copies of one hot title.
    // Without the distinct-string guard the neighborhood self-join would
    // produce ~n^2/2 candidate rows from the hot key alone; with it the
    // hot group is ONE distinct string and candidates are string-level.
    val n = 10000
    val hot = (1 to n).map(i => (i.toLong, "banana"))
    val rest = Seq((2000001L, "banan"),    // deletion  -> dist 1 vs hot
      (2000002L, "bananna"),               // insertion -> dist 1 vs hot
      (2000003L, "zzzzz"))                 // unrelated
    val df = (hot ++ rest).toDF("id", "s")
    val cand = Dedup.editDistance1Candidates(df, "id", "s").collect()
    assert(cand.length < n.toLong * n / 10, s"quadratic candidates: ${cand.length}")
    assert(cand.map(r => Set(r.getString(0), r.getString(1))).toSet ==
      Set(Set("banana", "banan"), Set("banana", "bananna")), cand.mkString(","))
    // dist-1 re-expansion is output-bound: each hot copy pairs with each
    // of the two distinct neighbors, nothing more
    val d1 = Dedup.editDistance1Pairs(df, "id", "s")
      .filter(col("dist") === 1).count()
    assert(d1 == 2L * n, s"expected ${2L * n} expanded dist-1 pairs, got $d1")
  }

  test("edit-distance-1 fuzzy join: variantCap drops hub variant keys") {
    import spark.implicits._
    // "" is a deletion variant of every 1-char key — a hub shared by 3
    // distinct strings here. With variantCap=2 the hub is dropped before
    // the self-join (documented recall trade: the 1-char substitution
    // pairs vanish); pairs evidenced by non-hub variants survive.
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "ab")).toDF("id", "s")
    def pairs(cap: Int) = Dedup.editDistance1Pairs(df, "id", "s", variantCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(2) == Set((1L, 4L), (2L, 4L)))
    assert(pairs(1000) == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
  }

  test("ngram df-cap: corpus-ubiquitous shingle dropped before the posting join") {
    import spark.implicits._
    // 1100 docs all share ONE boilerplate shingle (df=1100 > default cap
    // 1000); every other shingle is doc-unique. At threshold 0.0 any
    // surviving candidate pair would appear in the output, so the only
    // rows prove the hot shingle never reached the join — the clean
    // near-dup pair, whose rare shingles are unaffected (recall kept).
    val boiler = (1 to 1100).map(i =>
      (i.toLong, s"alpha beta gamma filler$i pad$i tail$i"))
    val clean = Seq(
      (2000001L, "zebra yak xylophone walrus vulture unique prose"),
      (2000002L, "zebra yak xylophone walrus vulture unique prose"))
    val df = (boiler ++ clean).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", k = 3,
      threshold = 0.0) // operator-default dfCap = 1000
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((2000001L, 2000002L, 1.0)), got.mkString(","))
  }

  test("cluster survivors: best quality wins, doc_id breaks ties") {
    import spark.implicits._
    // one 3-doc near-dup cluster: docs 1/2/3 share their text; doc 2 is
    // higher quality (clean prose), docs 1 and 3 carry heavy punctuation
    // so their punct_ratio drags quality down. Survivor must be 2.
    val noisy = "alpha beta gamma delta epsilon zeta eta theta !!! ??? %%% ###"
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, noisy), (2L, clean), (3L, noisy),
      (9L, "totally unrelated words nothing shared here at all right"))
      .toDF("doc_id", "text")
    val edges = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      k = 3, threshold = 0.5, dfCap = 1000000)
    val labels = DedupClusters.connectedComponents(edges, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val quality = df.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("q").desc, col("doc_id").asc)
    val out = labels.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        max(when(col("rn") === 1, col("doc_id"))).as("survivor"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 2L)),
      s"expected one 3-member cluster surviving as doc 2: ${out.toSeq}")
  }

  test("minhash-LSH finds near-dup and exact-dup pairs, not the distinct doc") {
    val pairs = Dedup.minhashLshPairs(docsDf, "doc_id", "text",
      numHashes = 128, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near dup
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: exact dup distance 0; near-dup small; distinct large") {
    import spark.implicits._
    val sh = docsDf.filter(length(col("text")) > 0)
      .select(col("doc_id"), TextExpressions.simhash(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 16)
    val pairs = Dedup.simhashPairs(docsDf, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("sourceOverlap: hand-checked matrix, zero-overlap pairs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "X", "a b c d"), // shingles {a b c, b c d}
      (2L, "X", "a b c d"), // in-source duplicate adds no new grams
      (3L, "Y", "a b c e"), // {a b c, b c e}
      (4L, "Z", "p q r")    // {p q r} — overlaps nothing
    ).toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // X↔Y share {a b c}: 1 of union 3 → ⌊10⁶/3⌋; Z pairs are absent
    assert(out == Map(
      ("X", "Y") -> ((2L, 2L, 1L, 333333L))), out.toString)
  }

  test("ngram jaccard: exact pair at 1.0, near pair high, df-cap guard works") {
    val out = Dedup.ngramJaccardPairs(docsDf, "doc_id", "text",
      threshold = 0.5, dfCap = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 4L)) == 1.0)
    assert(out((1L, 2L)) > 0.7 && out((1L, 2L)) < 1.0)
    // dfCap=1 drops every shared shingle → no pairs at all
    assert(Dedup.ngramJaccardPairs(docsDf, "doc_id", "text",
      threshold = 0.1, dfCap = 1).count() == 0)
  }

  test("embedding LSH near-dup recovers planted jittered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 200L).map(i =>
      (i, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val jittered = base.filter(_._1 % 20 == 0).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.001f)) }
    val df = (base ++ jittered).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.99, bandBits = 12, bandCount = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = base.map(_._1).filter(_ % 20 == 0).map(i => (i, i + 1000L)).toSet
    assert((expected -- pairs).isEmpty, s"missed: ${expected -- pairs}")
  }

  test("semantic dedup: in-cell copies drop to the lowest id, cellCap exempts") {
    import spark.implicits._
    // near-orthogonal base vectors (distinct one-hot direction + small
    // deterministic jitter — mutual cosine ≪ 0.999), plus exact copies of
    // vector 1 at higher ids. Exact copies share the integer cell by
    // construction and score cosine 1.0, so only the lowest id of the
    // group survives.
    def vec(s: Int): Array[Float] = Array.tabulate(32)(j =>
      if (j == s % 32) 1f else 0.01f * ((s * 31 + j * 7) % 11 - 5))
    val base = (1L to 20L).map(i => (i, vec(i.toInt)))
    val copies = Seq((101L, vec(1)), (102L, vec(1)))
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, cellBits = 6)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 22)
    assert(out(1L) && !out(101L) && !out(102L), out.toString)
    // distinct base vectors are nowhere near 0.999 cosine: all kept
    assert((2L to 20L).forall(out(_)), out.toString)

    // cellCap: the copy group's cell exceeds the cap -> exempt, all kept
    // (the guard is per-cell, so unrelated cells still prune normally)
    val capped = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, cellBits = 6, cellCap = 2L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(capped(1L) && capped(101L) && capped(102L), capped.toString)
  }

  test("MIPS: norm dominates cosine; augmented LSH recall on scaled data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // unit-ish directions with WIDELY varying magnitudes: the MIPS winner
    // is the large-norm vector aligned with the query, which cosine
    // ranking would ignore
    val pts = (0 until 500).map { i =>
      val dir = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(dir.map(x => x * x).sum)
      val scale = 1.0 + (i % 10) // norms 1..10
      (i.toLong, dir.map(x => (x / n * scale).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val query = pts.head._2.map(_.toDouble)
    val brute = Similarity.mipsTopK(df, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    // ground truth independently on the driver
    def dot(a: Array[Float], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expect = pts.sortBy(p => -dot(p._2, query)).take(20).map(_._1).toSet
    assert(brute == expect, "engine MIPS top-k must equal driver top-k")
    // the top-20 by inner product skews to large norms (scale ≥ 6 ⇒
    // i%10 ≥ 5); cosine's top-20 would be norm-blind
    val bigNorm = brute.count(_ % 10 >= 5)
    assert(bigNorm >= 15, s"MIPS should prefer large norms, got $bigNorm/20")
    // augmented quantized LSH clears the same recall regime the s12 gate
    // pins (≥ 4/10 on uniform corpus; clustered-by-norm data here)
    val approx = Similarity.mipsTopKQuantized(
      df, "vec_id", "embedding", query, 20).collect().map(_.getLong(0)).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.4, s"augmented-LSH MIPS recall was $recall")

    // repeated-query contract (r14 item 6): the M² stats pre-pass is paid
    // ONCE via corpusMaxNorm2, after which building further MIPS queries
    // over the same corpus launches zero jobs (pure lazy plans) and the
    // results are identical to the self-computing form
    val m2 = Similarity.corpusMaxNorm2(df, "embedding")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val query2 = pts(1)._2.map(_.toDouble)
      val q1 = Similarity.mipsTopKQuantized(
        df, "vec_id", "embedding", query, 20, maxNorm2 = Some(m2))
      val q2 = Similarity.mipsTopKQuantized(
        df, "vec_id", "embedding", query2, 20, maxNorm2 = Some(m2))
      // neither build ran a corpus stats scan (listener events post
      // asynchronously; a job launched during build would land well
      // within this drain window)
      Thread.sleep(1000)
      assert(jobs.get() == 0,
        s"building MIPS queries with a cached M2 ran ${jobs.get()} job(s)")
      assert(q1.collect().map(_.getLong(0)).toSet == approx,
        "cached-M2 MIPS must match the self-computing form exactly")
      assert(q2.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ANN: brute-force exact; LSH recall ≥ 0.8 on clustered data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 20 cluster centers, 50 points each with small noise
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextGaussian()))
    val pts = for (c <- centers.indices; j <- 0 until 50) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      ((c * 50 + j).toLong, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val query = centers(0).map(_ + 0.01)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(df, "vec_id", "embedding", query, 20,
      bandBits = 8, bandCount = 8).collect().map(_.getLong(0)).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall was $recall")
    // brute-force must rank cluster-0 members on top
    assert(brute.forall(_ < 50))

    // IVF with Lloyd-refined centroids must reach HIGH recall on the same
    // data (sampled seeds alone only cleared 0.8; refinement moves the
    // centroids onto the planted cluster structure)
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", query, 20,
      nlist = 16, nprobe = 6).collect().map(_.getLong(0)).toSet
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    assert(ivfRecall >= 0.9, s"IVF recall was $ivfRecall")

    // cell balance after refinement: no cell hoards the corpus (the
    // scale contract — a probe reads nprobe/nlist of the data, which is
    // only true if cells are comparably sized)
    val cells = Similarity.ivfAssignments(df, "vec_id", "embedding", nlist = 16)
      .groupBy("cell").count().collect().map(_.getLong(1))
    val mean = cells.sum.toDouble / 16
    assert(cells.max <= 4 * mean, s"max cell ${cells.max} vs mean $mean")

    // reproducibility: fixed-point Lloyd sums are partition-order
    // independent, so a repartitioned corpus yields bit-identical centroids
    val again = Similarity.ivfCentroids(df.repartition(7), "vec_id",
      "embedding", nlist = 16)
    val first = Similarity.ivfCentroids(df, "vec_id", "embedding", nlist = 16)
    assert(first.map(_._2.toSeq).toSeq == again.map(_._2.toSeq).toSeq)
  }

  test("ANN self-retrieval: an in-corpus query returns itself at rank 1") {
    import spark.implicits._
    // the contract every ANN index must honor REGARDLESS of tuning: an
    // identical vector shares all LSH bands / the same IVF cell, so the
    // query vector's own row must always surface first with cos 1.0
    val rnd = new scala.util.Random(23)
    val pts = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    val q = pts(137)._2.map(_.toDouble)
    for ((name, got) <- Seq(
        "lsh" -> Similarity.lshTopK(df, "vec_id", "embedding", q, 5,
          bandBits = 10, bandCount = 4),
        "ivf" -> Similarity.ivfTopK(df, "vec_id", "embedding", q, 5,
          nlist = 8, nprobe = 1),
        "qlsh" -> Similarity.quantizedLshTopK(df, "vec_id", "embedding", q, 5,
          bandBits = 4, bandCount = 8))) {
      val top = got.collect().head
      assert(top.getLong(0) == 137L, s"$name top-1 was ${top.getLong(0)}")
      assert(top.getDouble(1) == 1.0, s"$name self-cos ${top.getDouble(1)}")
    }
  }

  test("IVF-PQ: clustered recall, probe-independent codes, determinism") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextGaussian()))
    val pts = for (c <- centers.indices; j <- 0 until 50) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      ((c * 50 + j).toLong, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val query = centers(0).map(_ + 0.01)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val ivfpq = Similarity.ivfPqTopK(df, "vec_id", "embedding", query, 20,
      nlist = 16, nprobe = 6).collect()
    // the coarse level loses what IVF loses (cell misses); the ADC+refine
    // ranking inside the probed cells must NOT lose much more — raw ADC
    // alone measured 0.4 here, refine recovers the planted neighborhood
    val recall =
      (brute & ivfpq.map(_.getLong(0)).toSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF-PQ recall was $recall")

    // PQ codes are an index-build artifact of the FULL corpus, not of
    // the probed subset: each returned row's code must equal the code
    // the flat-PQ ranking (same corpus-trained codebook) assigns it
    val flatCodes = Similarity.pqTopK(df, "vec_id", "embedding", query,
      k = pts.size).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ivfpq.foreach { r =>
      assert(flatCodes(r.getLong(0)) == r.getLong(1),
        s"probe-dependent code for vec ${r.getLong(0)}")
    }

    // bit-determinism under repartition (fixed-point Lloyd + integer ADC)
    val again = Similarity.ivfPqTopK(df.repartition(7), "vec_id",
      "embedding", query, 20, nlist = 16, nprobe = 6).collect()
    assert(
      ivfpq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("int8 quantization: range, error bound, zero-vector safety, codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // codegen asserted on the bare projection (the AQE join wrapper below
    // hides whole-stage markers in the initial plan string)
    assert(Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString.contains("*("))
    val out = Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .join(df, "vec_id")
    out.collect().foreach { r =>
      val scale = r.getDouble(1)
      val qv = r.getSeq[Long](2)
      val v = r.getSeq[Float](3).map(_.toDouble)
      assert(qv.forall(q => q >= -127 && q <= 127), s"out of int8 range: $qv")
      // round-half-up: reconstruction error per component ≤ 0.5/scale (+eps)
      qv.zip(v).foreach { case (q, x) =>
        assert(math.abs(q / scale - x) <= 0.5 / scale * (1 + 1e-9),
          s"vec ${r.getLong(0)}: $x -> $q at scale $scale")
      }
      // the max-|x| component quantizes to ±127 exactly
      assert(qv.map(math.abs).max == 127L)
    }
    // all-zero vector: scale 1.0, all-zero codes, zero MSE
    import spark.implicits._
    val zero = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val zr = Embeddings.quantizationStats(zero, "vec_id", "embedding")
      .collect().head
    assert(zr.getDouble(1) == 1.0 && zr.getLong(2) == 0L &&
      zr.getLong(3) == 0L && zr.getDouble(4) == 0.0)
  }

  test("quantized LSH: declarative spec == codegen kernel == driver replica") {
    import graft.functions.VectorFunctions
    // parquet-backed (a LocalRelation would constant-fold the projection
    // away and hide the codegen assertion)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val bandBits = 4; val bandCount = 8
    // three-way: the declarative HOF form (the executable spec), the
    // single-pass codegen'd signature kernel (the production path), and
    // the driver-side replica must agree bit for bit
    val cols = (0 until bandCount).map(b =>
      Similarity.quantizedLshBucket(col("embedding"), bandBits, b).as(s"b$b"))
    val sel = df.select((col("vec_id") +: col("embedding") +:
      VectorFunctions.qlshSignature(col("embedding"), bandBits, bandCount)
        .as("sig") +: cols): _*)
    // bucket assignment must stay inside whole-stage codegen
    assert(sel.queryExecution.executedPlan.toString.contains("*("),
      sel.queryExecution.executedPlan.toString)
    sel.collect().foreach { r =>
      val vec = r.getSeq[Float](1).map(_.toDouble).toArray
      val sig = r.getSeq[Long](2)
      val spec = (0 until bandCount).map(b => r.getLong(b + 3))
      val expect = Similarity.quantizedBuckets(vec, bandBits, bandCount)
      assert(sig == expect, s"kernel vec ${r.getLong(0)}: $sig vs $expect")
      assert(spec == expect, s"spec vec ${r.getLong(0)}: $spec vs $expect")
    }
    // and buckets are not degenerate (some discrimination exists)
    val distinct = sel.select(col("b0")).distinct().count()
    assert(distinct > 1)
  }

  test("quantized LSH: any-match predicate == per-band bucket comparison") {
    import graft.functions.VectorFunctions
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.vectorOf(spark, "/root/testdata/sf0.001", 0L)
    val bandBits = 4; val bandCount = 8
    val qb = Similarity.quantizedBuckets(q, bandBits, bandCount)
    val viaKernel = df.filter(VectorFunctions.qlshAnyMatch(
      col("embedding"), qb, bandBits)).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val viaSpec = df.filter((0 until bandCount).map(b =>
        Similarity.quantizedLshBucket(col("embedding"), bandBits, b) ===
          org.apache.spark.sql.functions.lit(qb(b))).reduce(_ || _))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaKernel == viaSpec)
    assert(viaKernel.contains(0L)) // the query matches its own row
    // augmented variant: tail coordinate 0.0 must reproduce the plain
    // signature over query :+ 0.0 (the MIPS reduction's query side)
    val qbAug = Similarity.quantizedBuckets(q :+ 0.0, bandBits, bandCount)
    val viaAug = df.filter(VectorFunctions.qlshAnyMatchAug(col("embedding"),
        org.apache.spark.sql.functions.lit(0.0), qbAug, bandBits))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sigAug = df.select(col("vec_id"), VectorFunctions.qlshSignatureAug(
        col("embedding"), org.apache.spark.sql.functions.lit(0.0), bandBits,
        bandCount).as("sig")).collect()
      .filter(r => r.getSeq[Long](1).zip(qbAug).exists { case (a, b) => a == b })
      .map(_.getLong(0)).toSet
    assert(viaAug == sigAug)
  }

  test("containment: substring pair ≈1.0 where jaccard is low; disjoint absent") {
    import spark.implicits._
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = "alpha beta gamma delta epsilon zeta" // first 6 words: true substring
    val df = Seq(
      (1L, long),
      (2L, excerpt),
      (3L, "unrelated words entirely different in every position here now")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(df, "doc_id", "text",
      k = 3, threshold = 0.9, dfCap = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every 3-shingle of the excerpt appears in the long doc → exactly 1.0
    assert(cont.get((1L, 2L)).contains(1.0), s"got $cont")
    assert(!cont.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // the same pair is INVISIBLE to Jaccard at any usable threshold:
    // |A∩B| = 4 shingles, |A∪B| = 18 → j ≈ 0.22
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      k = 3, threshold = 0.5, dfCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)), "jaccard should miss the substring pair")
  }

  test("knn join: exact top-k per probe matches the naive ranking; LSH recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian()))
    val pts = for (c <- centers.indices; j <- 0 until 30) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
      ((c * 30 + j).toLong, v)
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val queries = pts.filter(p => p._1 % 30 == 0).take(3).toDF("vec_id", "embedding")

    val got = Similarity.knnJoin(queries, corpus, "vec_id", "embedding",
      "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("rank")), r.getLong(1)))

    // naive per-query ranking with the same (cos desc, id asc) tiebreak
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val byId = pts.toMap
    val expect = queries.collect().map(_.getLong(0)).flatMap { qid =>
      pts.map { case (id, v) =>
        (qid, BigDecimal(cos(byId(qid), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP), id)
      }.sortBy { case (_, c, id) => (-c, id) }.take(5).zipWithIndex
        .map { case ((q, _, id), i) => (q, i + 1, id) }
    }.toSet
    assert(got.toSet == expect, s"got=${got.toSet}\nexpect=$expect")

    // each probe's top-5 is its own cluster (sanity on the data shape)
    assert(got.forall { case (qid, _, id) => id / 30 == qid / 30 })

    // LSH variant: recall vs exact on the same probes
    val lsh = Similarity.knnJoinLsh(queries, corpus, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, bandBits = 6, bandCount = 10, seed = 7L)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id"))))
      .toSet
    val exact = got.map { case (q, _, id) => (q, id) }.toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"knn-join LSH recall was $recall")

    // quantized variant (the oracled default): same recall bar on the
    // same probes, no float in the candidate decision
    val qlsh = Similarity.knnJoinQuantized(queries, corpus, "vec_id",
      "embedding", "vec_id", "embedding", k = 5, bandBits = 4, bandCount = 8)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id"))))
      .toSet
    val qRecall = (exact & qlsh).size.toDouble / exact.size
    assert(qRecall >= 0.8, s"knn-join quantized-LSH recall was $qRecall")
  }

  test("multimodal decode plumbing: schema, determinism, null payloads") {
    import spark.implicits._
    val df = Seq(
      (1L, "some image bytes", "image"),
      (2L, "aud", "audio"),
      (3L, "vid bytes here", "video"))
      .toDF("doc_id", "txt", "modality")
      .select(col("doc_id"), col("txt").cast("binary").as("payload"), col("modality"))
    val out = Multimodal.withDecodedMeta(df, "doc_id", "payload", "modality")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).channels == 3 && out(1L).n_frames == 1)
    assert(out(2L).channels == 1)
    assert(out(3L).n_frames == 1 + ("vid bytes here".length % 29))
    assert(out(1L).n_bytes == "some image bytes".length)
    assert(out(1L).features.length == 8)
    // determinism: same payload → same features
    val again = Multimodal.withDecodedMeta(df, "doc_id", "payload", "modality")
      .collect().map(r => r.doc_id -> r.features.toSeq).toMap
    assert(again(1L) == out(1L).features.toSeq)
  }

  test("banded group similarity executes at 2000 groups") {
    import spark.implicits._
    // the G where the old crossJoin path would build 4M pairs: 2000
    // groups, one doc each, two planted twin groups — must complete
    // quickly on the banded path and surface the twin pair
    val docs = (0 until 2000).map(g =>
      (s"g$g", s"alpha$g bravo$g charlie$g delta$g echo$g foxtrot$g golf$g"))
    val twin = Seq(("tw1", "same words in both twin groups here now"),
      ("tw2", "same words in both twin groups here now"))
    val df = (docs ++ twin).toDF("grp", "text")
    val got = GroupSimilarity.groupPairSimilarity(df, "grp", "text",
      numHashes = 32, bands = 8, maxAllPairsGroups = 100)
      .filter(col("est_jaccard") >= 0.99)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("tw1", "tw2")), s"twin pair missing: $got")
  }

  test("sequence packing: next-fit within buckets, oversize docs isolated") {
    import spark.implicits._
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, words(6)),   // bin 0 (fill 6)
      (1L, words(3)),   // bin 0 (fill 9)
      (2L, words(4)),   // overflow → bin 1 (fill 4)
      (3L, words(20)),  // oversize alone → bin 2
      (4L, words(1)),   // bin 3 (oversize closed its bin at next doc)
      (100L, words(2)), // new bucket: bin 0
      (101L, null.asInstanceOf[String])) // 0 tokens: stays in bin 0
      .toDF("doc_id", "text")
    val got = Packing.packSequences(docs, "doc_id", "text",
      budget = 10, bucketSize = 100)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) == (0L, 0L, 6L) && got(1L) == (0L, 0L, 3L))
    assert(got(2L) == (0L, 1L, 4L))
    assert(got(3L) == (0L, 2L, 20L), got(3L).toString)
    assert(got(4L) == (0L, 3L, 1L))
    assert(got(100L) == (1L, 0L, 2L))
    assert(got(101L) == (1L, 0L, 0L))
  }

  test("decontamination flags docs containing blocklist text") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated content about spark execution plans here"),
      (3L, "the quick brown fox jumps over something else entirely today")
    ).toDF("doc_id", "text")
    // blocklist entry = a verbatim span of doc 1 (and a prefix of doc 3)
    val block = Seq((100L, "the quick brown fox jumps over"))
      .toDF("block_id", "text")
    val got = Dedup.contaminationFlags(corpus, "doc_id", "text",
      block, "block_id", "text", k = 3, threshold = 0.3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2))).toMap
    // doc 1: 4 of its 11 shingles are in the block entry → 4/11
    // doc 3: 4 of its 8 shingles → 0.5; doc 2: zero overlap → absent
    assert(got.keySet == Set(1L, 3L), got.toString)
    assert(got(1L) == (4.0 / 11, 1L), got(1L).toString)
    assert(got(3L) == (0.5, 1L), got(3L).toString)
  }

  test("contaminationRate: union-of-blocklist dirtiness, integral micro") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated content about spark execution plans here"),
      (3L, "the quick brown fox jumps over something else entirely today")
    ).toDF("doc_id", "text")
    // two blocklist entries: their shingle UNION is what counts, and a
    // shingle shared by both must not double-count (distinct set)
    val block = Seq("the quick brown fox jumps over",
      "fox jumps over the lazy dog").toDF("text")
    val got = Dedup.contaminationRate(corpus, "doc_id", "text",
        block, "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 has 11 distinct shingles; the entries' shingle union is 7
    // distinct ("fox jumps over" shared), all present in doc 1 → 7/11;
    // doc 3 shares only the 4 leading shingles of entry 1
    assert(got.keySet == Set(1L, 3L), got.toString)
    assert(got(1L) == ((11L, 7L, 636363L)), got(1L).toString)
    assert(got(3L) == ((8L, 4L, 500000L)), got(3L).toString)
  }

  test("container header parsers read real PNG/JPEG/WAV metadata") {
    // PNG: signature + IHDR, 640x480 truecolor+alpha
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0,
      0xde, 0xad, 0xbe, 0xef).map(_.toByte)
    assert(Multimodal.parsePngHeader(png).contains((640, 480, 4)))

    // JPEG: SOI, APP0 (skipped), SOF0 120x200, 3 components
    val jpeg = Array(0xff, 0xd8,
      0xff, 0xe0, 0, 4, 0x4a, 0x46, // APP0, len 4
      0xff, 0xc0, 0, 11, 8, 0, 120, 0, 200, 3, 1, 0x11, 0).map(_.toByte)
    assert(Multimodal.parseJpegHeader(jpeg).contains((200, 120, 3)))

    // WAV: RIFF/WAVE with an extra chunk before fmt (chunk walk)
    val wav = (Array[Int]('R', 'I', 'F', 'F', 100, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 2, 0, 0, 0, 9, 9, // junk chunk, word-aligned size 2
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 2, 0) ++
      Array[Int](0x44, 0xac, 0, 0) ++ // 44100 LE
      Array[Int](0x10, 0xb1, 0x02, 0, 4, 0, 16, 0)).map(_.toByte)
    assert(Multimodal.parseWavHeader(wav).contains((44100, 16, 2)))

    // sample decode round-trips the encoder exactly (the m11 input path)
    val pcm = Array.tabulate(77)(i => ((i * 1013) % 65521 - 32760).toShort)
    assert(Multimodal.decodeAudioSamples(Multimodal.pcmWav(8000, pcm))
      .exists(_.sameElements(pcm)))

    // unrecognized bytes fall back to the stub
    val junk = "just some text".getBytes("UTF-8")
    assert(Multimodal.parsePngHeader(junk).isEmpty)
    assert(Multimodal.parseJpegHeader(junk).isEmpty)
    assert(Multimodal.parseWavHeader(junk).isEmpty)
    val (w, h, c, f, _) = Multimodal.decodeMedia(junk, "video")
    assert((w, h, c, f) == (16 + junk.length % 624, 16 + junk.length % 464,
      3, 1 + junk.length % 29))
    // truncated headers must not crash, just fall back
    for (k <- 0 to png.length) assert(
      Multimodal.decodeMedia(png.take(k), "image") != null)
    for (k <- 0 to jpeg.length if k < 12)
      assert(Multimodal.parseJpegHeader(jpeg.take(k)).isEmpty)
    for (k <- 0 to wav.length) assert(
      Multimodal.decodeMedia(wav.take(k), "audio") != null)
  }

  test("real pixel decode: ImageIO round-trips exact channel means") {
    // non-solid image with hand-computable means: 2x2 with distinct pixels
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xff0000)
    img.setRGB(0, 1, 0x00ff00); img.setRGB(1, 1, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val st = Multimodal.decodePixelStats(bos.toByteArray).get
    assert(st.width == 2 && st.height == 2 && st.nPixels == 4)
    assert(st.meanR == 255.0 / 4 && st.meanG == 255.0 / 4 && st.meanB == 255.0 / 4)

    // solid helper: exact means, and the PNG header parser agrees with
    // the full decode on dimensions
    val png = Multimodal.solidPng(5, 3, 0x336699)
    val s2 = Multimodal.decodePixelStats(png).get
    assert((s2.width, s2.height) == ((5, 3)))
    assert((s2.meanR, s2.meanG, s2.meanB) == ((0x33.toDouble, 0x66.toDouble, 0x99.toDouble)))
    assert(Multimodal.parsePngHeader(png).map(p => (p._1, p._2)).contains((5, 3)))

    // non-image bytes: None, no crash
    assert(Multimodal.decodePixelStats("not an image".getBytes).isEmpty)

    // REAL resize: 40x10 fits 16x16 as (16, 4); solid color survives
    // nearest-neighbor exactly; the output is itself a decodable PNG
    val big = Multimodal.solidPng(40, 10, 0x112233)
    val rs = Multimodal.resizeImagePayload(big, 16, 16).get
    val r2 = Multimodal.decodePixelStats(rs).get
    assert((r2.width, r2.height) == ((16, 4)))
    assert((r2.meanR, r2.meanG, r2.meanB) ==
      ((0x11.toDouble, 0x22.toDouble, 0x33.toDouble)))
    // already-fitting images pass through at original dims
    val small = Multimodal.resizeImagePayload(Multimodal.solidPng(5, 3, 0x010203), 16, 16).get
    assert(Multimodal.decodePixelStats(small).exists(s => s.width == 5 && s.height == 3))
    assert(Multimodal.resizeImagePayload("junk".getBytes, 16, 16).isEmpty)
  }

  test("real audio decode: javax.sound round-trips exact PCM stats") {
    val samples = Array[Short](0, 100, -200, 300, -32760, 32760)
    val wav = Multimodal.pcmWav(16000, samples)
    val st = Multimodal.decodeAudioStats(wav).get
    assert(st.sampleRate == 16000 && st.channels == 1 && st.bits == 16)
    assert(st.nSamples == 6 && st.maxAbs == 32760)
    assert(st.meanAmp == samples.map(_.toLong).sum.toDouble / 6)
    // the WAV header parser reads the same format fields
    assert(Multimodal.parseWavHeader(wav).contains((16000, 16, 1)))
    // non-audio bytes: None, no crash
    assert(Multimodal.decodeAudioStats("not audio".getBytes).isEmpty)
  }

  test("gif/bmp/mp4 parsers read real container metadata") {
    // GIF89a logical screen descriptor: 320x200 LE
    val gif = (Array[Int]('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, 0xc8, 0x00, 0x91, 0, 0) map (_.toByte))
    assert(Multimodal.parseGifHeader(gif).contains((320, 200, 3)))

    // BMP with a 40-byte BITMAPINFOHEADER: 100x50 top-down, 24-bit
    val bmp = (Array[Int]('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 100, 0, 0, 0) ++
      Array[Int](0xce, 0xff, 0xff, 0xff) ++ // height -50 LE
      Array[Int](1, 0, 24, 0, 0, 0, 0, 0)).map(_.toByte)
    assert(Multimodal.parseBmpHeader(bmp).contains((100, 50, 3)))

    // MP4 via the fixture generator: the planted container must parse back
    import spark.implicits._
    val docs = Seq((8L, "abcdefgh")).toDF("doc_id", "text") // 8 % 3 = 2: video
    val payload = Multimodal.fakeMediaFrame(docs)
      .collect().head.getAs[Array[Byte]]("payload")
    // prefix = 300 + 4 * n_frames; n_frames = 1 + 8 % 29 = 9 → 336
    assert(payload.length == 336 + 8)
    // tkhd dims 16+8=24 each; stts total = 1 + 8 % 29 = 9 frames
    assert(Multimodal.parseMp4Header(payload).contains((24, 24, 9)))
    // mvhd: 9 frames at 30 fps → duration 180 ticks / 600 = 0.3 s
    assert(Multimodal.parseMp4Duration(payload).contains(0.3))
    // per-sample tables: stsz sizes 64 + (doc_id + i) % 191, stts starts
    // i·20 ticks — the planted arithmetic walked back out of the container
    val Some((sizes, starts)) = Multimodal.parseMp4SampleTable(payload)
    assert(sizes.toSeq == (0 until 9).map(i => 64L + (8 + i) % 191))
    assert(starts.toSeq == (0 until 9).map(i => 20L * i))

    // negatives: junk and truncations fall back, never crash
    val junk = "just some text".getBytes("UTF-8")
    assert(Multimodal.parseGifHeader(junk).isEmpty)
    assert(Multimodal.parseBmpHeader(junk).isEmpty)
    assert(Multimodal.parseMp4Header(junk).isEmpty)
    for (k <- 0 to payload.length by 7)
      assert(Multimodal.decodeMedia(payload.take(k), "video") != null)
  }

  test("fake media frame plants parseable headers") {
    import spark.implicits._
    val docs = Seq((0L, "pix"), (1L, "aud"), (2L, "vid"), (5L, "raw"),
      (600L, "x")).toDF("doc_id", "text")
    val rows = Multimodal.withDecodedMeta(
      Multimodal.fakeMediaFrame(docs), "doc_id", "payload", "modality")
      .collect().map(r => r.doc_id -> r).toMap
    // doc 0: PNG 16x16 truecolor, n_bytes = 3 + 33
    assert(rows(0L).width == 16 && rows(0L).height == 16)
    assert(rows(0L).channels == 3 && rows(0L).n_bytes == 36)
    // doc 600: PNG (16 + 600) x (16 + 600 % 464 = 152)
    assert(rows(600L).width == 616 && rows(600L).height == 152)
    // doc 1: WAV 16000 Hz (1 + 1 % 5 = 2), 16-bit, 2 channels
    assert(rows(1L).width == 16000 && rows(1L).height == 16)
    assert(rows(1L).channels == 2 && rows(1L).n_bytes == 3 + 36)
    // doc 2 (% 6 = 2): video = planted MP4, REAL tkhd dims + stts frames;
    // prefix = 300 + 4 * (1 + 2 % 29) = 312
    assert(rows(2L).n_bytes == 3 + 312 && rows(2L).n_frames == 1 + 2 % 29)
    assert(rows(2L).width == 18 && rows(2L).height == 18)
    // doc 5 (% 6 = 5): video = raw bytes, stub arithmetic
    assert(rows(5L).n_bytes == 3 && rows(5L).n_frames == 1 + 3 % 29)
  }

  test("gopher rules: each rule fails on its planted pathology") {
    import spark.implicits._
    val good = ("the quick brown fox likes to jump over logs and it " +
      "does that have with great energy ") * 5 // >50 words, stops present
    val rows = Seq(
      (1L, good),                                     // passes everything
      (2L, "short text only"),                        // words_ok fails
      (3L, good + " aaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 40), // mwl too long
      (4L, good + " #" * 30),                         // symbol ratio fails
      (5L, good + "\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),
      (6L, good + ("\nline that trails off..." * 9)), // ellipsis lines
      (7L, good + (" 123 456" * 40)),                 // alpha fraction fails
      (8L, ("lorem ipsum dolor sit amet consectetur " * 10))) // no stops
      .toDF("id", "text")
    val r = TextAnalysis.gopherRules(col("text"))
    val got = rows.select(col("id"), r.as("r"), TextAnalysis.gopherKeep(col("text")).as("keep"))
      .collect().map(x => x.getLong(0) ->
        (x.getStruct(1).toSeq.drop(1).map(_.asInstanceOf[Boolean]), x.getBoolean(2))).toMap
    assert(got(1L)._2, got(1L).toString)                  // keeps the clean doc
    assert(!got(2L)._1(0) && !got(2L)._2)                 // words_ok
    assert(!got(3L)._1(1) && !got(3L)._2)                 // mwl_ok
    assert(!got(4L)._1(2) && !got(4L)._2)                 // symbol_ok
    assert(!got(5L)._1(3) && !got(5L)._2)                 // bullet_ok
    assert(!got(6L)._1(4) && !got(6L)._2)                 // ellipsis_ok
    assert(!got(7L)._1(5) && !got(7L)._2)                 // alpha_ok
    assert(!got(8L)._1(6) && !got(8L)._2)                 // stop_ok
  }

  test("language id picks profile languages deterministically") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog are in the house"),
      (2L, "el gato y el perro es una cosa para este"),
      (3L, "der Hund und die Katze ist nicht auf dem Tisch"),
      (4L, "le chat et le chien est dans la maison avec les autres"),
      (5L, "zzz qqq xxx")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "es")
    assert(got(3L) == "de"); assert(got(4L) == "fr")
    assert(got(5L) == "und")
  }

  test("MinHash-union aggregator: group signature estimates exact Jaccard") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 200).map(i => s"w$i")
    // group A and B share ~half their vocabulary through their docs
    def doc(words: Seq[String]) = Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" ")
    val a = (0 until 20).map(i => ("A", doc(vocab.take(120))))
    val b = (0 until 20).map(i => ("B", doc(vocab.drop(80))))
    val df = (a ++ b).toDF("grp", "text")
    val est = GroupSimilarity.groupPairSimilarity(df, "grp", "text", numHashes = 256)
      .collect().head.getDouble(2)

    // exact group-level shingle Jaccard for comparison
    def shingles(rows: Seq[(String, String)]) = rows.flatMap { case (_, t) =>
      val tok = t.toLowerCase.split("\\s+")
      tok.sliding(3).map(_.mkString(" "))
    }.toSet
    val (sa, sb) = (shingles(a), shingles(b))
    val exact = (sa & sb).size.toDouble / (sa | sb).size
    assert(math.abs(est - exact) < 0.12,
      s"estimate $est vs exact $exact")
  }

  test("banded group similarity recovers the similar pair among many groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 300).map(i => s"w$i")
    def doc(words: Seq[String]) = Seq.fill(25)(words(rnd.nextInt(words.size))).mkString(" ")
    // 25 groups of disjoint-ish vocab slices; groups T1/T2 are near-copies
    val noise = (0 until 25).flatMap(g =>
      (0 until 4).map(_ => (s"n$g", doc(vocab.slice(g * 12, g * 12 + 12)))))
    val twinDocs = (0 until 4).map(_ => doc(vocab.take(40)))
    val twins = twinDocs.map(("t1", _)) ++ twinDocs.map(("t2", _))
    val df = (noise ++ twins).toDF("grp", "text")
    val got = GroupSimilarity.groupPairSimilarity(df, "grp", "text",
      numHashes = 128, bands = 32, maxAllPairsGroups = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // identical doc sets → signature agreement 1.0; the banded path must
    // surface exactly this pair with estimate 1.0
    assert(got.contains(("t1", "t2")), s"banded path missed the twin pair: $got")
    assert(got(("t1", "t2")) == 1.0, s"twin estimate ${got(("t1", "t2"))}")
  }

  test("subword count splits on case and letter/digit boundaries") {
    import spark.implicits._
    val got = Seq("helloWorld abc123", "", "plain words here")
      .toDF("text")
      .select(TextAnalysis.subwordCount(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4L, 0L, 3L)) // hello|World abc|123 → 4
  }

  test("paragraphDedup keeps first corpus-wide occurrence only") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"unique alpha\n\n$boiler\n\nunique beta"),
      (2L, s"$boiler\n\nunique gamma"),
      (3L, s"$boiler"), // every paragraph is a duplicate → empty doc
      (4L, "solo paragraph never repeated")
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 4)
    // doc 1 is the first occurrence of the boilerplate → keeps all 3
    assert(got(0) == ((1L, 3L, 3L, s"unique alpha\n\n$boiler\n\nunique beta")))
    // docs 2/3 lose the boilerplate; doc 3 keeps its row, empty
    assert(got(1) == ((2L, 2L, 1L, "unique gamma")))
    assert(got(2) == ((3L, 1L, 0L, "")))
    assert(got(3) == ((4L, 1L, 1L, "solo paragraph never repeated")))
    // in-doc repetition: second copy inside the SAME doc also drops
    val sameDoc = Dedup.paragraphDedup(
      Seq((9L, "echo\n\necho\n\nother")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(sameDoc.getLong(2) == 2L && sameDoc.getString(3) == "echo\n\nother")
  }

  test("quality classifier: hashed features and integer logits behave") {
    import spark.implicits._
    val w = QualityClassifier.weightTable(spark, 64).collect()
    assert(w.length == 64)
    assert(w.forall(r => r.getLong(1) >= -8 && r.getLong(1) <= 8))
    // distinct-ish weights — the Knuth hash spreads buckets
    assert(w.map(_.getLong(1)).distinct.length > 8)

    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha")).toDF("doc_id", "text")
    val feats = QualityClassifier.hashedFeatures(df, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // 3 unigrams + 2 bigrams = 5 grams for docs 1/2; 1 for doc 3
    assert(feats.filter(_._1 == 1L).map(_._3).sum == 5L)
    assert(feats.filter(_._1 == 3L).map(_._3).sum == 1L)
    assert(feats.forall(f => f._2 >= 0 && f._2 < 64))

    val s = QualityClassifier.score(df, "doc_id", "text", dim = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(s.length == 3)
    assert(s(0)._3 == s(1)._3, "identical text must score identically")
    assert(s.forall(r => r._4 == (r._3 > 0)))
  }

  test("vocabulary truncates deterministically and oovStats counts the tail") {
    import spark.implicits._
    val df = Seq(
      (1L, "aa bb aa bb aa cc"),
      (2L, "aa bb dd ee"),
      (3L, "zz")
    ).toDF("doc_id", "text")
    // counts: aa=4 bb=3 cc=1 dd=1 ee=1 zz=1 → minCount=2 keeps aa,bb;
    // maxSize=1 truncates to just aa
    val v = TextAnalysis.vocabulary(df, "text", minCount = 2L, maxSize = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(v.toSeq == Seq((1L, "aa", 4L)))
    // tie-break: cc/dd/ee all count 1 → lexicographic
    val v2 = TextAnalysis.vocabulary(df, "text", minCount = 1L, maxSize = 4)
      .collect().map(_.getString(1))
    assert(v2.toSeq == Seq("aa", "bb", "cc", "dd"))
    val oov = TextAnalysis.oovStats(df, "doc_id", "text",
      TextAnalysis.vocabulary(df, "text", minCount = 2L, maxSize = 2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(oov(0) == ((1L, 6L, 1L, 0.166667))) // cc is OOV
    assert(oov(1) == ((2L, 4L, 2L, 0.5)))      // dd, ee OOV
    assert(oov(2) == ((3L, 1L, 1L, 1.0)))      // zz OOV
  }

  test("bm25 ranks by term coverage, rarity and length normalization") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark query engine with spark joins and spark shuffles"),
      (2L, "spark query"),            // both terms, shortest doc
      (3L, "query query query query"),
      (4L, "nothing relevant here at all"),
      (5L, "spark")
    ).toDF("doc_id", "text")
    val qs = Seq(("q1", "spark query")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", qs,
      "query_id", "qtext", topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    // doc 4 shares no term — absent from the candidate set
    assert(!got.map(_._1).contains(4L))
    assert(got.length == 4)
    // doc 2 covers both terms in the shortest doc → ranks first
    assert(got(0)._1 == 2L, s"got ${got.toSeq}")
    // scores strictly ordered and positive
    assert(got.map(_._2).forall(_ > 0))
    assert(got.sliding(2).forall(p => p(0)._2 >= p(1)._2))
  }

  test("cosine is exact on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 24.0 / 25.0) < 1e-12)
  }

  test("rrfFuse: integer reciprocal ranks sum, one-sided ids still rank") {
    import spark.implicits._
    val lex = Seq(("q", 10L, 1L), ("q", 20L, 2L)).toDF("query_id", "id", "rank")
    val vec = Seq(("q", 20L, 1L), ("q", 30L, 2L)).toDF("query_id", "id", "rank")
    val got = Retrieval.rrfFuse(lex, vec, "query_id", "id", "rank",
      kRrf = 60, topK = 10)
      .collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3))) // (id, rank, score)
      .sortBy(_._2)
    // doc 20: 1000000/62 + 1000000/61 = 16129 + 16393 = 32522 — top
    // doc 10: 1000000/61 = 16393; doc 30: 1000000/62 = 16129
    assert(got.toSeq == Seq((20L, 1L, 32522L), (10L, 2L, 16393L),
      (30L, 3L, 16129L)))
  }

  test("chunkDocuments: windows tile with overlap, ragged tail, empty skipped") {
    import spark.implicits._
    val df = Seq((1L, "abcdefghij"), // 10 chars
      (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "doc_id", "text",
      size = 4, overlap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // step 2: doc 1 (len 10) -> starts 0,2,4,6,8; doc 2 (len 3) -> 0,2
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, "abcd"), (1L, 1L, 2L, "cdef"), (1L, 2L, 4L, "efgh"),
      (1L, 3L, 6L, "ghij"), (1L, 4L, 8L, "ij"),
      (2L, 0L, 0L, "abc"), (2L, 1L, 2L, "c")))
  }

  test("chunkDocuments: every character is covered; zero overlap partitions") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 5 // 130 chars
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text",
      size = 50, overlap = 0)
      .orderBy("chunk_idx").collect().map(_.getString(3))
    assert(chunks.mkString == text) // zero overlap => exact partition
    assert(chunks.map(_.length).toSeq == Seq(50, 50, 30))
    // reject bad params loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "doc_id", "text", size = 4, overlap = 4)
    }
  }

  test("bigram surprise: seen / backoff / OOV-floor charges, hand-computed") {
    import spark.implicits._
    // LM corpus: "a b a b c" → C2(a,b)=2 (b,a)=1 (b,c)=1; C1 a=2 b=2 c=1; N=5
    val lm = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b a b c"), // in-LM doc: all bigrams seen
      (2L, "a b z c"))   // held-out: seen + OOV-floor(z) + backoff(c)
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramSurprise(lm, score, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).sortBy(_._1).toSeq
    // doc 1: (a,b)=bitlen(2/2)-1=0 twice, (b,a)=(b,c)=bitlen(2/1)-1=1 each
    // doc 2: (a,b)=0; (b,z): z unknown → 4+bitlen(5)-1=6;
    //        (z,c): c known  → 4+bitlen(5/1)-1=6
    assert(r == Seq(
      (1L, 4L, 0L, 2L, 500L),
      (2L, 3L, 2L, 12L, 4000L)))
  }

  test("hard negatives: labels differ, ranks contiguous, recall vs exact") {
    import spark.implicits._
    // The regime hard-negative mining exists for: two CONFUSABLE classes
    // (close clusters, different labels). Banding recall is high exactly
    // where it matters — the near-boundary cross-label pairs. (On far
    // random negatives any LSH has low recall by design; that regime's
    // mining value is nil.)
    val rnd = new scala.util.Random(7)
    val c0 = Array.fill(32)(rnd.nextGaussian())
    val pts = for (lbl <- 0 to 1; j <- 0 until 40) yield {
      val v = c0.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      ((lbl * 40 + j).toLong, v, lbl)
    }
    val df = pts.toDF("vec_id", "embedding", "label")
    val probes = df.filter(col("vec_id") < 5)
    val out = Similarity.hardNegatives(probes, df, "vec_id", "embedding",
      "label", "vec_id", "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getInt(5)))
    assert(out.nonEmpty)
    // no mined negative shares its probe's label; ranks run 1..n per probe
    assert(out.forall { case (_, ql, _, nl, _) => ql != nl })
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._5).sorted.toSeq == (1 to g.length))
    }
    // every probe has label 0, so every mined negative is a label-1 point
    assert(out.forall { case (_, ql, v, nl, _) => ql == 0 && nl == 1 && v >= 40 })
    // recall vs the exact different-label top-5 (banded candidates are
    // approximate; the same 0.8 bound as the s05/s08 specs)
    val exactTop = (for (p <- pts if p._1 < 5) yield {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        d / math.sqrt(na) / math.sqrt(nb)
      }
      pts.filter(_._3 != p._3)
        .map(q => (q._1, cos(p._2, q._2)))
        .sortBy { case (id, c) => (-c, id) }
        .take(5).map { case (id, _) => (p._1, id) }
    }).flatten.toSet
    val mined = out.map { case (q, _, v, _, _) => (q, v) }.toSet
    val recall = (exactTop & mined).size.toDouble / exactTop.size
    assert(recall >= 0.8, s"recall was $recall")
  }

  test("winnowing: match guarantee, density, rightmost tie rule") {
    import spark.implicits._
    val k = 4; val w = 4
    // two docs sharing a long run (>= w+k-1 = 7 words) MUST share a
    // fingerprint; a third unrelated doc must not match either
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = Seq(
      (1L, s"unique one two three $shared"),
      (2L, s"$shared different tail words here"),
      (3L, "completely unrelated content about other topics entirely " +
        "nothing in common with the rest at all")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byDoc = fps.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "guaranteed: a shared >= w+k-1 word run yields a common fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
    // density: winnowing keeps ~2/(w+1) of grams; on a long random doc
    // the selected fraction stays well under 1/2 and above 1/(2w)
    val rnd = new scala.util.Random(5)
    val long = (1 to 2000).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val sel = Dedup.winnowFingerprints(
      Seq((9L, long)).toDF("doc_id", "text"), "doc_id", "text", k, w)
      .count().toDouble
    val nGrams = 2000 - k + 1
    assert(sel / nGrams > 1.0 / (2 * w) && sel / nGrams < 0.5,
      s"selected density ${sel / nGrams} outside winnowing band")
    // rightmost tie rule: a doc of one repeated word has ONE distinct
    // gram hash; every window picks the rightmost position in frame,
    // and the distinct fingerprint set collapses to few positions
    val rep = Seq((7L, Seq.fill(20)("same").mkString(" "))).toDF("doc_id", "text")
    val repFps = Dedup.winnowFingerprints(rep, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(repFps.map(_._1).distinct.length == 1)
    // rightmost rule: selected positions are the window ENDS p+w-1, so
    // the first selected position is w (1-based), not 1
    assert(repFps.map(_._2).min == w,
      s"rightmost tie rule should first select position $w, got ${repFps.map(_._2).min}")
  }

  test("MMR: skips the redundant near-twin, picks the diverse doc") {
    import spark.implicits._
    // candidates: id 1 = best rel; id 2 = near-identical twin of 1 with
    // 2nd-best rel; id 3 = orthogonal direction, lower rel. Pure
    // relevance ranking picks (1, 2); MMR must pick (1, 3): the twin's
    // redundancy penalty 0.3·~1.0 dwarfs its 0.7·0.05 rel edge.
    val cand = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0.95),
      (2L, Array(0.999f, 0.04f, 0.0f), 0.90),
      (3L, Array(0.0f, 1.0f, 0.0f), 0.60),
      (4L, Array(0.0f, 0.9f, 0.4f), 0.55)
    ).toDF("vec_id", "embedding", "rel")
    val picks = Retrieval.mmrSelect(cand, "vec_id", "embedding", "rel", k = 3)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(picks.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected diversity-aware order, got ${picks.toSeq}")
    // and the scores are the fixed formula over rounded sims
    val r2 = Retrieval.mmrSelect(cand, "vec_id", "embedding", "rel", k = 3)
      .filter(col("step") === 2).collect()(0)
    assert(math.abs(r2.getDouble(r2.fieldIndex("mmr")) -
      (0.7 * 0.60 - 0.3 * 0.0)) < 1e-9) // doc 3 ⊥ doc 1: maxsim = 0
  }

  test("Kneser-Ney: P(w|ctx) sums to 1 over vocab; backoff paths fire") {
    import spark.implicits._
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog sat")).toDF("doc_id", "text")
    val vocab = Seq("the", "cat", "sat", "on", "mat", "dog", "log", "a", "and")
    // one probe document per (ctx, w) pair: its single bigram's
    // kn_avg_prob IS P_KN(w|ctx)
    def probs(ctx: String): Map[String, Double] = {
      val probes = vocab.zipWithIndex
        .map { case (w, i) => (i.toLong, s"$ctx $w") }.toDF("doc_id", "text")
      TextAnalysis.knBigramScore(train, probes, "doc_id", "text")
        .collect().map(r => vocab(r.getLong(0).toInt) ->
          r.getLong(r.fieldIndex("kn_avg_fix")) / 1.0e12).toMap
    }
    // seen context: the discount mass redistributes exactly — the
    // telescoping sum [Σc − D·N1+] / cw + D·N1+/cw · Σ P_cont = 1
    // (P_cont sums to 1 over the TRAINING vocabulary by construction)
    for (ctx <- Seq("the", "sat", "a")) {
      val total = probs(ctx).values.sum
      assert(math.abs(total - 1.0) < 1e-6, s"ctx=$ctx sums to $total")
    }
    val pThe = probs("the")
    // seen bigram ("the cat") outweighs unseen-under-this-context
    // ("the log"), which still gets positive continuation mass
    assert(pThe("cat") > pThe("log") && pThe("log") > 0, pThe.toString)
    // unseen context backs off to the continuation distribution alone
    val pZ = probs("zzz")
    assert(math.abs(pZ.values.sum - 1.0) < 1e-6, s"unseen ctx: ${pZ.values.sum}")
    // frequent-as-continuation words score higher there than rare ones
    assert(pZ("sat") > pZ("mat"), pZ.toString)
  }

  test("dsir weights: hand-computed charges, backoff floor, keep sign") {
    import spark.implicits._
    // Distinct buckets for x/y/z (asserted below, 4096 buckets): the
    // hand-computation assumes no hash collision between the 3 tokens.
    val b = Seq("x", "y", "z").map(t =>
      java.lang.Math.floorMod(GraftHash.fnv1a64(t.getBytes("UTF-8")), 4096L))
    assert(b.distinct.size == 3)
    val raw = Seq((1L, "x x y"), (2L, "x y z")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1L)
    // raw LM: x:3 y:2 z:1 N=6 → bits x=bitlen(2)-1=1, y=bitlen(3)-1=1,
    //   z=bitlen(6)-1=2.  target LM: x:2 y:1 N=3 → bits x=0, y=1;
    //   z floor = bitlen(3)-1+4 = 5.
    // doc1 (x,x,y): raw=3 tgt=1 logw=+2 keep; doc2 (x,y,z): raw=4 tgt=6
    //   logw=-2, mean = -2000 div 3 = -666 (both engines truncate to 0).
    val r = TextAnalysis.dsirWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getBoolean(6))).toSeq
    assert(r == Seq(
      (1L, 3L, 3L, 1L, 2L, 666L, true),
      (2L, 3L, 4L, 6L, -2L, -666L, false)))
  }

  test("d23 LSH sweep: candidates monotone in bands, true pairs always " +
    "caught, planted probes stay sub-threshold") {
    val out = graft.queries.DedupQueries.d23LshTuning(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).toSeq == Seq(8L, 16L, 32L))
    // more bands ⇒ shorter keys ⇒ candidate set only grows
    assert(out.map(_._2).sliding(2).forall(p => p.head <= p.last),
      out.mkString(","))
    // the ≥0.7 truth set is at j≈0.99 — every config catches all of it
    out.foreach { case (b, _, nTrue, nCaught, recall) =>
      assert(nTrue > 0 && nCaught == nTrue && recall == 1000000L,
        s"bands=$b: $nCaught/$nTrue")
    }
    // the planted mid-similarity probes inflate candidates beyond the
    // truth set at 32 bands (the selectivity cost the sweep measures)
    assert(out.last._2 > out.last._3, out.mkString(","))
  }

  test("p26 source concentration: hand-computed Gini on a toy corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p26t").toString
    // sources: a = 30 tokens, b = 10 → MAD pairs Σ|xi−xj| = 40,
    // G = 40 / (2·2·40) = 0.25; top share 30/40 = 750000
    Seq(
      (1L, ("w " * 30).trim, "en", "a", 1L),
      (2L, ("w " * 10).trim, "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.queries.PipelineQueries
      .p26SourceConcentration(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (2L, 40L, 30L, 250000L, 750000L), r.toString)
  }

  test("p25 leakage-safe split: clusters move atomically; naive split " +
    "would leak") {
    val out = graft.queries.PipelineQueries.p25LeakageSafeSplit(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getString(0)).sorted.toSeq ==
      Seq("test", "train", "val"))
    out.foreach { r =>
      assert(r.getLong(3) == 0L, s"cluster-aware split leaked: $r")
      // the corpus plants near-dups, so per-doc hashing MUST leak some
      assert(r.getLong(4) > 0L, s"naive baseline should leak: $r")
      assert(r.getLong(1) >= r.getLong(2), s"docs >= clusters: $r")
    }
    // 80/10/10 shape: train strictly dominates
    val byName = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") + byName("test"), byName.toString)
  }

  test("s18 filtered ANN: per-class ranks are dense, scores ordered, " +
    "self-hit present in its own class") {
    val out = graft.queries.SimilarityQueries.s18FilteredAnn(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (label, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.size).toSeq,
        s"label $label ranks not dense: $sorted")
      assert(sorted.map(-_._4).toSeq == sorted.map(-_._4).sorted.toSeq,
        s"label $label not cos-ordered: $sorted")
    }
    // query vec 0 always matches its own bucket: rank 1 of its class is
    // vec 0 itself at cos 1.0
    val self = out.find(r => r._3 == 0L)
    assert(self.exists(r => r._2 == 1L && r._4 == 1.0), self.toString)
  }

  test("s17 config sweep: coarser bands buy candidates and recall") {
    val out = graft.queries.SimilarityQueries.s17LshConfigSweep(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 8L))
    // fewer bits per band (same 32 total) ⇒ monotone MORE candidates
    // and at-least-as-much recall — the S-curve direction itself
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last),
      out.mkString(","))
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last),
      out.mkString(","))
    // the sweep must actually discriminate on this corpus
    assert(out.head._2 > out.last._2, out.mkString(","))
  }

  test("s15 recall curve: one row per k, hits monotone, recall exact") {
    val out = graft.queries.SimilarityQueries.s15RecallCurve(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 5L, 10L), out.mkString(","))
    out.foreach { case (k, hits, micro) =>
      assert(hits >= 0 && hits <= k, s"hits@$k out of range: $hits")
      assert(micro == hits * 1000000L / k, s"recall math: $k $hits $micro")
    }
    // hits are monotone in k (top-k sets are nested on both sides)
    assert(out.map(_._2).sliding(2).forall(p => p.head <= p.last),
      out.mkString(","))
    // the index must actually retrieve: exact top-1 is vec 0 itself
    // (cos = 1), and its bucket always matches its own query
    assert(out.head._2 == 1L, s"recall@1 must be 1: ${out.head}")
  }

  test("ttrDeciles: integer decile math, cap at 9, empties excluded") {
    import spark.implicits._
    val df = Seq(
      "a a a a",      // 1 distinct / 4 tokens -> (10*1) div 4 = 2
      "a b a b",      // 2/4 -> 5
      "a b c d",      // 4/4 -> 10, capped to 9
      "A b a B",      // lowercased: 2/4 -> 5
      "", "   "       // empty after trim -> excluded entirely
    ).toDF("text")
    val out = TextAnalysis.ttrDeciles(df, "text")
      .orderBy("ttr_decile")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (2L, 1L, 1L, 4L), (5L, 2L, 4L, 8L), (9L, 1L, 4L, 4L)),
      out.mkString(","))
  }

  test("vocabGrowth: first-seen buckets, cumulative sums, empty buckets") {
    import spark.implicits._
    // 4 docs over 2 buckets (ids 0-3, buckets = 2 -> {0,1} | {2,3});
    // doc 3 is empty so bucket 1 has 2 docs but tokens from doc 2 only
    val df = Seq(
      (0L, "a b c"),   // unigrams a,b,c (3 tokens) — all first seen in b0
      (1L, "a a b"),   // 3 more tokens, no new words
      (2L, "c d"),     // d is new in bucket 1; c already seen
      (3L, "  ")       // empty after trim: counted as a doc, zero tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(df, "doc_id", "text",
        buckets = 2, ngram = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 3L, 6L, 3L),   // 2 docs, {a,b,c} new, 6 cum tokens
      (1L, 2L, 1L, 8L, 4L)),  // {d} new, 8 cum tokens, 4 cum vocab
      out.mkString(","))
    // a bucket with docs but no tokens still emits a row with zero deltas
    val sparse = Seq((0L, "x y"), (1L, ""), (2L, ""), (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(sparse, "doc_id", "text",
        buckets = 4, ngram = 1).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(4)).toSeq == Seq(2L, 2L, 2L, 2L),
      "cum_vocab must carry through empty buckets")
  }

  test("simpsonDiversity: exact integral index, uniform vs collapsed") {
    import spark.implicits._
    val df = Seq(
      ("u", "a b c d"),   // uniform: 4 types x 1 -> D = (16-4)/16 = 0.75
      ("c", "a a a a"),   // collapsed: D = (16-16)/16 = 0
      ("m", "a a b b"),   // D = (16-8)/16 = 0.5
      ("m", "")           // empties excluded
    ).toDF("g", "text")
    val out = TextAnalysis.simpsonDiversity(df, "g", "text", ngram = 1)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "u" -> ((4L, 4L, 750000L)),
      "c" -> ((1L, 4L, 0L)),
      "m" -> ((2L, 4L, 500000L))),
      out.toString)
  }

  test("zipfProbe: power-of-two ranks, octave decay, tie order by word") {
    import spark.implicits._
    // frequencies: a=8, b=4, c=4, d=1 -> ranks 1..4; probes at 1,2,4
    val df = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(4)("c") ++
      Seq("d")
    val out = TextAnalysis.zipfProbe(df.map(w => w).toDF("text"),
        "text", maxRank = 4, ngram = 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", 8L, -1L),          // rank 1: no previous octave
      (2L, "b", 4L, 500000L),      // 4/8 — tie (b,c) broken word-asc
      (4L, "d", 1L, 250000L)),     // 1/4
      out.mkString(","))
  }
}
