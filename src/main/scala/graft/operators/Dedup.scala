package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Deduplication operators for training-data pipelines, all expressed as
  * declarative Spark plans so Catalyst/AQE handle distribution:
  *
  *  - exact: hash aggregate on a fingerprint — one shuffle of (hash, id),
  *    never of full texts;
  *  - MinHash + LSH banding: row-local signature, explode to `bands`
  *    (bandId, bandHash) keys, self-join on the band key — the classic
  *    shuffle-based candidate generation whose cost is O(candidates), not
  *    O(n²) — then exact-Jaccard verification of candidates only;
  *  - SimHash: row-local 64-bit sketch, candidates via the 4×16-bit
  *    chunk pigeonhole (any pair within Hamming distance 3 shares at least
  *    one exact chunk), verified with `bit_count(a ^ b)`;
  *  - n-gram Jaccard: inverted-index self-join on distinct shingles with a
  *    document-frequency cap — the cap is the skew guard: a shingle shared
  *    by k docs contributes k² join rows, so ubiquitous shingles are
  *    dropped (documented recall trade, standard at scale).
  *
  * At 100 TB the only all-pairs structure ever materialized is the
  * candidate set, whose size is tuned by (numHashes, bands) / chunk width /
  * dfCap — the knobs exposed here.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical value of `key`.
    * The group key is shuffled as-is — pass a fingerprint column (md5/
    * fnv1a64 of the body) rather than raw document text so the shuffle
    * stays fixed-width; see d01ExactDedup. */
  def exactCanonical(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.select(col(keyCol), col(idCol))
      .groupBy(col(keyCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Edit-distance ≤ 1 fuzzy-join pairs via DELETION NEIGHBORHOODS — the
    * typo-dedup primitive for short keys (titles, product names, URLs).
    *
    * Two strings are within edit distance 1 iff they share a member of
    * each other's deletion neighborhood (the string itself plus every
    * single-character deletion — L+1 variants for length L), so the pair
    * search is an ordinary equi-join on the variant key. Two skew guards
    * keep the join sub-quadratic on real corpora:
    *
    *  1. identical strings collapse to ONE representative before variant
    *     generation (a web corpus has millions of copies of "home" — each
    *     contributes one neighborhood row, not k rows whose self-join
    *     would be k²); verified pairs re-expand to member ids at the end,
    *     so expansion cost is bounded by OUTPUT size, never by a join
    *     intermediate;
    *  2. `variantCap` drops variant keys shared by more than that many
    *     DISTINCT strings before the self-join — the same df-cap recall
    *     trade as the shingle operators (a variant hub like the empty
    *     string under 1-char keys is noise, not signal).
    *
    * Candidates are verified with exact `levenshtein` (built-in,
    * codegen'd) at the distinct-string level, so hash collisions can't
    * produce false pairs and each distinct string pair is verified once
    * no matter how many rows carry it. Intended for SHORT key columns —
    * the fan-out is length-proportional; fuzzy-matching whole documents
    * belongs to the shingle operators above.
    *
    * Null and EMPTY strings are excluded by contract: rows whose key is
    * null or "" produce no pairs (so ("", "a") is never reported). Callers
    * that need empty-key semantics should map "" to a sentinel first.
    *
    * Returns (id_a, id_b, dist), id_a < id_b, dist ∈ {0, 1}. Note dist-0
    * pairs enumerate every pair inside an identical-string group — k
    * copies yield k·(k-1)/2 OUTPUT rows by definition; if group-level
    * results are enough, run [[exactCanonical]] first and feed only the
    * canonical rows here. */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String,
      variantCap: Int = 1000): DataFrame = {
    val base = df
      .select(col(idCol).cast("long").as("fid"), col(strCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) > 0)
      .repartition(col("s"))
    // verified DISTINCT-string pairs (lev == 1), each unordered pair once
    val verified = editDistance1Candidates(df, idCol, strCol, variantCap)
    // re-expand to member ids: every member of group(sa) pairs with every
    // member of group(sb) at distance 1 — both joins are on `s`, the same
    // key `base` is partitioned by, so expansion adds no new shuffle of
    // the membership table and its row count IS the output count
    val dist1 = verified
      .join(base.select(col("s").as("sa"), col("fid").as("ia")), "sa")
      .join(base.select(col("s").as("sb"), col("fid").as("ib")), "sb")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), lit(1).as("dist"))
    // dist-0: all pairs within each identical-string group. The self-join
    // on `s` is co-partitioned and produces exactly the output rows — an
    // output-bound cost inherent to the pair contract, not a candidate
    // blow-up (see scaladoc)
    val dist0 = base.select(col("s"), col("fid").as("id_a"))
      .join(base.select(col("s"), col("fid").as("id_b")), "s")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("dist"))
    dist1.union(dist0)
  }

  /** Verified distance-1 pairs over DISTINCT key strings: (sa, sb), each
    * unordered pair exactly once. This is the candidate stage of
    * [[editDistance1Pairs]] — its row count is what the skew guards bound
    * (spec-tested with a planted 10⁴-copy hot key), and it is the
    * group-level result to use when per-id expansion isn't needed. */
  private[graft] def editDistance1Candidates(df: DataFrame, idCol: String,
      strCol: String, variantCap: Int = 1000): DataFrame = {
    // one representative per distinct string (skew guard 1)
    val distinctS = df
      .select(col(idCol).cast("long").as("fid"), col(strCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) > 0)
      .groupBy("s").agg(min(col("fid")).as("rep"))
    val s = col("s")
    val variants = distinctS.select(col("rep"),
      explode(transform(sequence(lit(0), length(s)),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))))
        .as("v"))
      .distinct() // a string like "aa" yields the same deletion twice
    // variant-frequency guard (skew guard 2), same shape as the shingle
    // dfCap: count per variant key BEFORE any posting list materializes;
    // keys with a single posting can't form a pair, keys above the cap
    // are dropped (documented recall trade)
    val shared = variants.groupBy("v")
      .agg(count(lit(1)).as("vdf"))
      .filter(col("vdf") >= 2 && col("vdf") <= variantCap)
      .select("v")
    val pruned = variants.join(shared, "v")
    val cand = pruned.select(col("v"), col("rep").as("rep_a"))
      .join(pruned.select(col("v"), col("rep").as("rep_b")), "v")
      .filter(col("rep_a") < col("rep_b"))
      .select("rep_a", "rep_b").distinct()
    // verify once per distinct-string pair; the strings differ, so
    // lev ≥ 1 and the distance-1 test is an equality
    val reps = distinctS.select(col("rep"), col("s"))
    cand
      .join(reps.select(col("rep").as("rep_a"), col("s").as("sa")), "rep_a")
      .join(reps.select(col("rep").as("rep_b"), col("s").as("sb")), "rep_b")
      .filter(levenshtein(col("sa"), col("sb")) === 1)
      .select(col("sa"), col("sb"))
  }

  /** MinHash-LSH near-duplicate candidate pairs with exact-Jaccard verify.
    *
    * @param numHashes signature length (r*b must equal it)
    * @param bands     number of LSH bands (b); rows per band r = numHashes/b
    * @param threshold exact word-k-shingle Jaccard cutoff for verified pairs
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, k: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // repartition materializes the signature table behind ONE exchange:
    // the banding branch and both payload-reattach joins read it via
    // ReusedExchange, so minhash + shingling run once over the corpus
    // instead of once per consumer — at scale this is "materialize the
    // signature table", the standard shape for LSH dedup
    val sig = df.select(col(idCol).as("doc_id"),
      TextExpressions.minhash(col(textCol), numHashes, k).as("sig"),
      TextExpressions.shingleSet(col(textCol), k).as("sh"))
      .filter(col("sig").isNotNull)
      .repartition(col("doc_id"))

    // (doc, band, hash-of-band-slice): band key is a single long, so the
    // self-join shuffles fixed-width keys regardless of document size.
    // repartition on the join key puts an Exchange under both self-join
    // branches → ReusedExchange computes the (interpreted) minhash explode
    // once instead of once per branch, and the join is already co-partitioned
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * r + lit(1), lit(r)), b))).as(Seq("band", "bhash")))
      .repartition(col("band"), col("bhash"))

    // candidate generation stays NARROW (ids only): deduping (id_a,id_b)
    // before re-attaching shingle arrays keeps the shuffle rows fixed-width
    // — carrying array payloads through dropDuplicates forces a wide-row
    // SortAggregate that dominates runtime at scale
    val left = banded.select(col("doc_id").as("id_a"), col("band"), col("bhash"))
    val right = banded.select(col("doc_id").as("id_b"), col("band"), col("bhash"))
    val candidates = left.join(right, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val shingleTbl = sig.select(col("doc_id"), col("sh"))
    candidates
      .join(shingleTbl.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingleTbl.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Signature-table rows for the incremental near-dup STORE: (doc_id,
    * sig) with null signatures (empty/whitespace docs) dropped — nothing
    * to band or compare. This is the artifact a daily-ingest pipeline
    * PERSISTS (alongside [[nearDupBandKeys]]' bucket index) so history is
    * signatured exactly once, ever. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, k: Int = 3): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      TextExpressions.minhash(col(textCol), numHashes, k).as("sig"))
      .filter(col("sig").isNotNull)

  /** Band-bucket index rows (doc_id, band, bkey) over a signature table:
    * bkey is the FNV-1a64 of the band's comma-joined signature slice — a
    * fixed 8-byte store key (what a production bucket index persists and
    * equi-joins on) that still mirrors bit-for-bit in SQL, unlike a
    * murmur3 `hash()`. */
  def nearDupBandKeys(sigs: DataFrame, numHashes: Int = 128,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => TextExpressions.fnv1a64(
          array_join(transform(slice(col("sig"), b * r + lit(1), lit(r)),
            x => x.cast("string")), ","))))
        .as(Seq("band", "bkey")))
  }

  /** Exact MinHash-agreement estimate between two signature columns:
    * matching positions / numHashes — an integer count over a power-of-two
    * divisor, so the double is engine-exact. */
  /** In-batch candidate (ia, ib) pairs over a (doc_id, band, bkey) bucket
    * index: capped-resident side × full side on (band, bkey), ia < ib.
    * Package-private so specs can pin the sub-quadratic fan-out a hot
    * bucket produces under `bucketCap` — ≤ cap·members candidates instead
    * of members·(members−1)/2. */
  private[graft] def inBatchCandidates(index: DataFrame,
      bucketCap: Int): DataFrame =
    capResidents(index, bucketCap)
      .select(col("doc_id").as("ia"), col("band"), col("bkey"))
      .join(index.select(col("doc_id").as("ib"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib").dropDuplicates("ia", "ib")

  /** Keep only the `cap` lowest-id members of each (band, bkey) bucket —
    * the batch mirror of the streaming bucket's stops-admitting-past-cap
    * rule (state arrives in id order there, so residents are the lowest
    * ids in both shapes). Identity when the cap is unset: no window, no
    * extra shuffle. */
  private def capResidents(index: DataFrame, cap: Int): DataFrame =
    if (cap == Int.MaxValue) index
    else {
      import org.apache.spark.sql.expressions.Window
      index.withColumn("_rn", row_number().over(
          Window.partitionBy(col("band"), col("bkey"))
            .orderBy(col("doc_id"))))
        .filter(col("_rn") <= cap).drop("_rn")
    }

  private def sigAgreement(a: Column, b: Column, numHashes: Int): Column =
    round(aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes, 6)

  /** INCREMENTAL NEAR-dup detection against a persisted store — d19's
    * daily-ingest shape extended from exact fingerprints to MinHash band
    * buckets. `storeSigs` is yesterday's signature table ((doc_id, sig),
    * built once by [[minhashSignatures]] and never recomputed — history
    * TEXT is never re-read, let alone re-signatured); the batch signatures
    * itself, probes the store's band-bucket index by (band, bkey)
    * equi-join, verifies candidates with the exact integer agreement
    * estimate, and checks itself the same way (earlier id wins in-batch).
    * Unique rows' signatures + bucket keys are what the caller appends to
    * the store.
    *
    * Scale shape: both candidate joins ship ids + an 8-byte bucket key;
    * signatures re-attach to the surviving candidate pairs only, by plain
    * equi-join (fixed 128-long rows — never document text). History size
    * enters only the store-probe join, which in production is bucketed by
    * bkey ⇒ co-located. New batches never reclassify old documents.
    *
    * `bucketCap` bounds any one (band, bkey) bucket's RESIDENT side — the
    * same graceful degradation as the streaming twin
    * [[graft.streaming.StreamingDedup.nearDupHits]]: past the cap a bucket
    * stops admitting residents (lowest ids stay resident — the canonical
    * survivors), so a boilerplate bucket fans out O(cap · members) instead
    * of O(members²). Every doc still PROBES (compares against residents);
    * recall only drops for a pair whose sole shared bucket is hot and
    * whose lower id fell past the cap — the documented LSH skew trade.
    *
    * @return one row per batch doc: (doc_id, status ∈ dup_of_history |
    *         dup_in_batch | unique, dup_of, est_j) — history partner wins
    *         over in-batch, lowest partner id on ties. */
  def incrementalNearDup(storeSigs: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 128, bands: Int = 16,
      k: Int = 3, threshold: Double = 0.9,
      storeIndex: Option[DataFrame] = None,
      bucketCap: Int = Int.MaxValue): DataFrame = {
    val batchSigs = minhashSignatures(batch, idCol, textCol, numHashes, k)
    // honor the persisted-index contract: a caller that stored
    // [[nearDupBandKeys]]' (doc_id, band, bkey) rows passes them here and
    // history is never re-banded; the fallback derives the index from the
    // signature store (still never from history TEXT)
    val storeB = capResidents(storeIndex
      .getOrElse(nearDupBandKeys(storeSigs, numHashes, bands)), bucketCap)
      .select(col("doc_id").as("hid"), col("band"), col("bkey"))
    val batchBAll = nearDupBandKeys(batchSigs, numHashes, bands)
    val batchB = batchBAll
      .select(col("doc_id").as("bid"), col("band"), col("bkey"))
    val histHit = batchB.join(storeB, Seq("band", "bkey"))
      .select("bid", "hid").dropDuplicates("bid", "hid")
      .join(batchSigs.select(col("doc_id").as("bid"), col("sig").as("sa")),
        "bid")
      .join(storeSigs.select(col("doc_id").as("hid"), col("sig").as("sb")),
        "hid")
      .select(col("bid"), col("hid"),
        sigAgreement(col("sa"), col("sb"), numHashes).as("est"))
      .filter(col("est") >= threshold)
      .groupBy("bid")
      .agg(min(struct(col("hid"), col("est"))).as("m"))
      .select(col("bid").as("doc_id"), col("m.hid").as("hist_dup"),
        col("m.est").as("hist_est"))
    val batchHit = inBatchCandidates(batchBAll, bucketCap)
      .join(batchSigs.select(col("doc_id").as("ia"), col("sig").as("sa")),
        "ia")
      .join(batchSigs.select(col("doc_id").as("ib"), col("sig").as("sb")),
        "ib")
      .select(col("ia"), col("ib"),
        sigAgreement(col("sa"), col("sb"), numHashes).as("est"))
      .filter(col("est") >= threshold)
      .groupBy("ib")
      .agg(min(struct(col("ia"), col("est"))).as("m"))
      .select(col("ib").as("doc_id"), col("m.ia").as("batch_dup"),
        col("m.est").as("batch_est"))
    batch.select(col(idCol).cast("long").as("doc_id"))
      .join(histHit, Seq("doc_id"), "left")
      .join(batchHit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("hist_dup").isNotNull, "dup_of_history")
          .when(col("batch_dup").isNotNull, "dup_in_batch")
          .otherwise("unique").as("status"),
        coalesce(col("hist_dup"), col("batch_dup")).as("dup_of"),
        when(col("hist_dup").isNotNull, col("hist_est"))
          .when(col("batch_dup").isNotNull, col("batch_est")).as("est_j"))
  }

  /** SimHash near-dup pairs within `maxHamming` (≤3 for full recall with
    * 4 chunks of 16 bits, by pigeonhole). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      TextExpressions.simhash(col(textCol), k).as("simhash"))
      .filter(col("simhash").isNotNull)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "cval")))
    val l = chunked.select(col("doc_id").as("id_a"), col("simhash").as("sim_a"),
      col("chunk"), col("cval"))
    val rt = chunked.select(col("doc_id").as("id_b"), col("simhash").as("sim_b"),
      col("chunk"), col("cval"))
    l.join(rt, Seq("chunk", "cval"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        expr("bit_count(sim_a ^ sim_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard pairs via inverted-index self-join.
    *
    * @param dfCap shingles appearing in more than `dfCap` docs are dropped
    *              before the join (skew guard; lowers recall for pairs whose
    *              overlap is only ubiquitous shingles — acceptable since
    *              such overlap is weak evidence anyway)
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5, dfCap: Int = 1000): DataFrame =
    ngramPairCounts(df, idCol, textCol, k, dfCap)
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("size_a") + col("size_b") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Exact n-gram CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|,|B|).
    *
    * Containment is the substring-dedup scorer Jaccard cannot be: a short
    * document fully embedded in a much longer one (a quoted excerpt, a
    * boilerplate-wrapped copy) has near-zero Jaccard — the union is
    * dominated by the long side — but containment ≈ 1, since every shingle
    * of the short side appears in the long side. Shingle containment is the
    * scalable approximation of suffix-based exact substring detection: a
    * true substring of ≥ k words implies containment 1.0 exactly, while
    * requiring only the same inverted-index machinery as Jaccard (one
    * shuffle on shingle, pair counts, no suffix array).
    *
    * Same posting/df-cap plumbing as [[ngramJaccardPairs]]; only the
    * scoring differs. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9, dfCap: Int = 1000): DataFrame =
    ngramPairCounts(df, idCol, textCol, k, dfCap)
      .withColumn("containment", round(col("common").cast("double") /
        least(col("size_a"), col("size_b")).cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))

  /** SOURCE-level n-gram overlap matrix: exact Jaccard between every
    * pair of corpus sources over their DISTINCT word-k-shingle sets —
    * the cross-crawl redundancy census run before mixing sources into a
    * training corpus (two crawls with jaccard ≈ 1 are the same crawl;
    * budgeting them as independent double-counts their mass).
    *
    * Scale shape: the corpus collapses to DISTINCT (source, shingle)
    * postings in one partial-agg shuffle — everything after is bounded
    * by |vocabulary|·|sources|, never corpus rows. Pairs generate via
    * the [[ngramJaccardPairs]] posting-list discipline (per-shingle
    * sorted source list + positional slice, each unordered pair exactly
    * once — no self-join), and a shingle's fan-out is capped at
    * |sources|² by construction, so no df-cap is needed. Scores are
    * ⌊10⁶·common/union⌋ integers.
    *
    * @return (source_a, source_b, grams_a, grams_b, common,
    *         jaccard_micro) with source_a < source_b; pairs sharing NO
    *         gram are absent (their overlap is 0 by definition, and
    *         emitting the empty cells would make the operator's output
    *         |sources|² even when nothing overlaps) */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // distinct posting feeds both the per-source sizes and the pair
    // counts; materialize it once (vocabulary-bounded, fixed-width)
    val posting = df.select(col(srcCol).as("source"),
        TextExpressions.shingleExplode(col(textCol), k))
      .select("source", "shingle")
      .distinct()
      .localCheckpoint()
    val sizes = posting.groupBy("source").agg(count(lit(1)).as("sz"))
    val pairs = posting
      .groupBy("shingle")
      .agg(sort_array(collect_list(col("source"))).as("ss"))
      .select(posexplode(col("ss")).as(Seq("i", "a")), col("ss"))
      .select(col("a"),
        explode(slice(col("ss"), col("i") + lit(2), size(col("ss")))).as("b"))
      .groupBy(col("a").as("source_a"), col("b").as("source_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("sz").as("grams_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("sz").as("grams_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("grams_a"),
        col("grams_b"), col("common"),
        expr("""cast((common * cast(1000000 as bigint))
                 div (grams_a + grams_b - common) as bigint)""")
          .as("jaccard_micro"))
  }

  /** Shared inverted-index pair counting for the exact n-gram scorers:
    * (id_a, id_b, size_a, size_b, common) with id_a < id_b, `common` the
    * count of shared distinct shingles and size_* each side's distinct
    * shingle count. */
  private def ngramPairCounts(df: DataFrame, idCol: String, textCol: String,
      k: Int, dfCap: Int): DataFrame = {
    // ShingleExplode generator: posting rows (shingle, per-doc distinct
    // count) stream straight out of tokenization — no per-doc shingle
    // array materialized and re-exploded. Shared Exchange: the df-count
    // aggregate and the posting-list join reuse one computation of it
    // (see minhashLshPairs)
    val posting = df.select(col(idCol).as("doc_id"),
      TextExpressions.shingleExplode(col(textCol), k))
      .repartition(col("shingle"))
    val rare = posting.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2) // df=1 can't form a pair
      .select("shingle")
    // df-cap BEFORE materializing any posting list: a hot shingle is
    // dropped by the count aggregate (constant memory) and never collected
    val filtered = posting.join(rare, "shingle")

    // per-shingle posting list (≤ dfCap by construction), then each
    // unordered doc pair generated exactly ONCE via positional slice —
    // half the intermediate rows of a self-join, and `filtered` is
    // computed once instead of once per join branch
    filtered
      .groupBy("shingle")
      .agg(collect_list(struct(col("doc_id"), col("sh_size"))).as("ds"))
      .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
      .select(col("a"), explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
      .select(
        when(col("a.doc_id") < col("b.doc_id"), col("a.doc_id"))
          .otherwise(col("b.doc_id")).as("id_a"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.doc_id"))
          .otherwise(col("a.doc_id")).as("id_b"),
        when(col("a.doc_id") < col("b.doc_id"), col("a.sh_size"))
          .otherwise(col("b.sh_size")).as("size_a"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.sh_size"))
          .otherwise(col("a.sh_size")).as("size_b"))
      .groupBy("id_a", "id_b", "size_a", "size_b")
      .agg(count(lit(1)).as("common"))
  }

  /** Benchmark DECONTAMINATION: flag corpus documents whose word-k-shingle
    * containment against ANY blocklist document (eval/benchmark text)
    * reaches `threshold` — the standard pre-training hygiene pass that
    * keeps test sets out of training data.
    *
    * Score per (doc, block) pair: |shingles(doc) ∩ shingles(block)| /
    * |shingles(doc)| — the fraction of the CORPUS document already present
    * in the blocklist entry. Bipartite inverted-index join on the shingle
    * key (same shape as [[ngramJaccardPairs]], but corpus×blocklist
    * instead of self-join): both sides shuffle once on `shingle`, pair
    * volume is bounded by shingle co-occurrence, never |corpus|×|blocklist|.
    * The df-cap drops shingles appearing in more than `dfCap` blocklist
    * entries (boilerplate guard — blocklists are small and curated, so a
    * hot blocklist shingle is noise, not signal).
    *
    * Returns one row per flagged doc: (doc_id, max_contamination, n_hits ≥
    * threshold). Exact arithmetic (integer counts, one IEEE division) —
    * fully SQL-mirrorable. */
  def contaminationFlags(corpus: DataFrame, corpusIdCol: String,
      corpusTextCol: String, blocklist: DataFrame, blockIdCol: String,
      blockTextCol: String, k: Int = 3, threshold: Double = 0.5,
      dfCap: Int = 1000): DataFrame = {
    val cp = corpus.select(col(corpusIdCol).as("doc_id"),
      TextExpressions.shingleExplode(col(corpusTextCol), k))
      .repartition(col("shingle"))
    val bp = blocklist.select(col(blockIdCol).as("block_id"),
      TextExpressions.shingleExplode(col(blockTextCol), k))
      .select(col("block_id"), col("shingle"))
      .repartition(col("shingle"))
    val rare = bp.groupBy("shingle")
      .agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") <= dfCap)
      .select("shingle")
    val hits = cp.join(bp.join(rare, "shingle"), "shingle")
      .groupBy("doc_id", "block_id", "sh_size")
      .agg(count(lit(1)).as("common"))
      .withColumn("containment",
        col("common").cast("double") / col("sh_size").cast("double"))
    hits.filter(col("containment") >= threshold)
      .groupBy("doc_id")
      .agg(max(col("containment")).as("max_contamination"),
        count(lit(1)).as("n_hits"))
  }

  /** Continuous contamination RATE — the GPT-3-appendix "dirtiness"
    * measure that [[contaminationFlags]]' per-block threshold rounds to a
    * boolean: per corpus document, the fraction of its distinct
    * word-k-shingles that appear ANYWHERE in the blocklist (union over
    * all blocklist entries, not per-entry containment). Sub-threshold
    * partial overlaps — invisible to the flag pass — surface here, which
    * is what a contamination-budget report actually tracks.
    *
    * Plan: blocklist shingles collapse to a DISTINCT set (bounded by
    * blocklist vocabulary, tiny vs the corpus), the corpus semi-joins on
    * the shingle key (both sides hash-partitioned by shingle — the
    * inverted-index shape again, nothing pairwise), and one doc-keyed
    * partial agg emits integral micro rates. Docs with zero dirty
    * shingles are absent (the report reads "what IS contaminated").
    *
    * @return (doc_id, n_shingles, n_dirty, dirty_micro =
    *         ⌊10⁶·n_dirty/n_shingles⌋), one row per dirty doc. */
  def contaminationRate(corpus: DataFrame, corpusIdCol: String,
      corpusTextCol: String, blocklist: DataFrame,
      blockTextCol: String, k: Int = 3): DataFrame = {
    val cp = corpus.select(col(corpusIdCol).as("doc_id"),
      TextExpressions.shingleExplode(col(corpusTextCol), k))
    val bset = blocklist
      .select(TextExpressions.shingleExplode(col(blockTextCol), k))
      .select("shingle").distinct()
    cp.join(bset, Seq("shingle"), "left_semi")
      .groupBy("doc_id")
      .agg(max(col("sh_size")).cast("bigint").as("n_shingles"),
        count(lit(1)).as("n_dirty"))
      .select(col("doc_id"), col("n_shingles"), col("n_dirty"),
        expr("""cast((cast(n_dirty as decimal(38,0)) * 1000000)
                 div n_shingles as bigint)""").as("dirty_micro"))
  }

  /** Exact duplicated-substring SPAN detection — the word-level analogue of
    * suffix-array substring dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022), re-expressed as a linear
    * shuffle plan instead of a suffix array:
    *
    *  1. every word position emits its forward `gramLen`-gram (a bounded
    *     string: `gramLen` words);
    *  2. one map-side-combining aggregate counts occurrences per gram —
    *     a gram occurring at ≥ 2 (doc, pos) sites anywhere in the corpus is
    *     "duplicated";
    *  3. occurrences join back on the gram key (both sides hash-partitioned
    *     by gram — co-partitioned shuffle join, no pair explosion: unlike
    *     pairwise dedup this marks POSITIONS, so cost is linear in corpus
    *     size, never quadratic in duplicate cluster size);
    *  4. per document, runs of consecutive duplicated gram starts merge
    *     into maximal spans via the gaps-and-islands window (partitioned by
    *     doc — bounded by document length, not corpus size).
    *
    * A true repeated substring of ≥ gramLen words is always found (every
    * gram inside it repeats); spans shorter than gramLen words are below
    * the detection floor, the standard precision/recall dial (Lee et al.
    * use 50 BPE tokens).
    *
    * Returns (doc_id, span_start, span_len, n_grams): 1-based word index,
    * span length in words, and the number of duplicated gram starts merged
    * into the span. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("p")
    dupGramOccurrences(df, idCol, textCol, gramLen)
      .select("doc_id", "p")
      .withColumn("grp", col("p") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) - min(col("p")) + gramLen).as("span_len"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_len"), col("n_grams"))
  }

  /** Substring-level corpus CLEANING on top of [[duplicateSpans]]'
    * machinery: every duplicated gram keeps exactly one canonical
    * occurrence — the global minimum (doc_id, pos) site — and every word
    * covered by a non-canonical occurrence is removed; the survivors are
    * re-joined in order. This is Lee-et-al's "remove all but one copy of
    * each duplicated substring", with the canonical-site choice made
    * deterministic so the result is oracle-exact.
    *
    * Scale shape: the canonical site comes from the same partial-agg
    * gram count (min over a packed (doc,pos) key — map-side combine, no
    * per-gram window); covered-position expansion is a narrow generate;
    * the reassembly groups by doc_id only (bounded by document length).
    *
    * Returns one row per non-empty document: (doc_id, n_removed,
    * cleaned_text) — cleaned_text is the whitespace-normalized lowercase
    * rejoin of surviving words ('' when the whole document was removed). */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int = 8): DataFrame = {
    val toks = tokens(df, idCol, textCol)
    val noncanon = dupGramOccurrences(df, idCol, textCol, gramLen)
      .filter(col("pk") =!= col("min_pk"))
    val covered = noncanon
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(gramLen - 1))).as("pos"))
      .distinct()
    val words = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i", "w")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"), col("w"))
    val kept = words.join(covered, Seq("doc_id", "pos"), "left_anti")
    val cleaned = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w"))).as("cleaned"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_words"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned_text"))
  }

  /** Whitespace tokenization shared by the substring-dedup family —
    * lowercase + trim + split on runs of whitespace, empty docs dropped
    * (mirrors the DuckDB STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')
    * oracle side exactly). */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("t"))

  /** Packing bounds for the (doc_id, position) → long key below: 23 bits of
    * position (documents up to 8,388,607 words — a ~40 MB text; a 100 TB web
    * corpus's concatenated-log outliers fit) and the remaining 40 signed
    * bits of doc_id (±5.5×10¹¹ ids). ENFORCED, not assumed: an out-of-range
    * row fails the job with a clear message instead of silently mis-ordering
    * canonical-site selection. */
  private[operators] val PackPosLimit: Long = 1L << 23
  private[operators] val PackDocLimit: Long = 1L << 39

  /** Duplicated-gram occurrence sites: (doc_id, p, gram, pk, min_pk) for
    * every (doc, 1-based word position) whose forward `gramLen`-gram occurs
    * ≥ 2 times corpus-wide. `pk` packs (doc_id, p) into one orderable long
    * (order-preserving because p < [[PackPosLimit]] and |doc_id| <
    * [[PackDocLimit]], both runtime-enforced via `assert_true`) so the
    * canonical site is a plain `min` — partial-aggregatable, unlike a
    * per-gram window.
    *
    * GRAM IDENTITY IS A VERIFIED 128-BIT HASH (r21, guide §2.3 "shuffle
    * keys and metadata instead of payloads"): the count/min-pk aggregate
    * used to group by the 8-word gram STRING, so its exchange carried
    * ~gramLen× the corpus text (the dominant shuffle of d10/d11 at any
    * scale). The gram is now keyed by two independent xxhash64 values
    * over the token-array slice — 16 fixed bytes per distinct gram in
    * the agg state, and the gram string is never even materialized for
    * non-duplicated positions (token arrays are whitespace-split, so
    * array equality ⇔ joined-string equality). Collisions are made LOUD,
    * never silent: every occurrence of a duplicated hash re-joins
    * (broadcast — the dup set is tiny by definition), the per-hash
    * min(gram)=max(gram) check runs over exactly those rows, and every
    * emitted row asserts it — two grams colliding on BOTH 64-bit hashes
    * anywhere in the dup set fails the job with a clear message
    * (birthday bound ≈ n²/2¹²⁹: ~10⁻¹⁵ at 10¹² distinct grams). */
  private def dupGramOccurrences(df: DataFrame, idCol: String,
      textCol: String, gramLen: Int): DataFrame = {
    val occ = tokens(df, idCol, textCol)
      .filter(size(col("t")) >= gramLen)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (gramLen - 1))).as("p0"))
      .select(col("doc_id"), col("p0").cast("long").as("p"),
        slice(col("t"), col("p0"), lit(gramLen)).as("garr"))
      // the coalesce(assert_true…, 0) term is always 0 but ties the range
      // check to pk so the optimizer cannot prune it
      .withColumn("pk",
        col("doc_id") * lit(PackPosLimit) + col("p") +
          coalesce(assert_true(
            col("p") < lit(PackPosLimit) &&
              col("doc_id") < lit(PackDocLimit) &&
              col("doc_id") > lit(-PackDocLimit),
            format_string(
              "substring-dedup packing overflow: doc_id=%d position=%d " +
                "exceed the 40/23-bit (doc, position) split (|doc_id| < " +
                s"$PackDocLimit, position < $PackPosLimit). Split oversize " +
                "documents or remap ids before deduplication.",
              col("doc_id"), col("p"))).cast("long"), lit(0L)))
      .withColumn("gh1", xxhash64(col("garr")))
      .withColumn("gh2", xxhash64(lit(1), col("garr")))
    val dup = occ.groupBy("gh1", "gh2")
      .agg(count(lit(1)).as("cnt"), min(col("pk")).as("min_pk"))
      .filter(col("cnt") >= 2)
      .select("gh1", "gh2", "min_pk")
    // duplicated positions only — bounded by the corpus's true duplicate
    // mass, so the checkpoint is small and the collision check + both
    // downstream consumers read it instead of re-deriving occ
    val matched = occ.join(broadcast(dup), Seq("gh1", "gh2"))
      .withColumn("gram", concat_ws(" ", col("garr")))
      .select("doc_id", "p", "gram", "pk", "min_pk", "gh1", "gh2")
      .localCheckpoint()
    val chk = matched.groupBy("gh1", "gh2")
      .agg((min(col("gram")) === max(col("gram"))).as("grams_equal"))
    matched.join(broadcast(chk), Seq("gh1", "gh2"))
      .withColumn("pk", col("pk") +
        coalesce(assert_true(col("grams_equal"),
          lit("gram-hash collision: two distinct 8-grams share both " +
            "xxhash64 keys; rerun with string-keyed grouping")).cast("long"),
          lit(0L)))
      .select("doc_id", "p", "gram", "pk", "min_pk")
  }

  /** Embedding cosine near-dup pairs via sign-random-projection banding:
    * `bandCount` independent `bandBits`-bit sketches; a pair is a candidate
    * if any band matches; verified with exact sequential-fold cosine. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, bandBits: Int = 12, bandCount: Int = 4,
      seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions
    // narrow candidate generation (ids only), vectors re-attached after the
    // pair dedup — see minhashLshPairs for the rationale
    // one exchange materializes (vid, vec): bucket branch and both payload
    // joins reuse it instead of recomputing the (possibly derived) vector
    // column per consumer — see minhashLshPairs
    val vecs = df.select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .repartition(col("vid"))
    val withBuckets = vecs.select(col("vid"),
      posexplode(array((0 until bandCount).map(b =>
        VectorFunctions.embLshBucket(col("vec"), bandBits, seed + b)): _*))
        .as(Seq("band", "bucket")))
    val l = withBuckets.select(col("vid").as("id_a"), col("band"), col("bucket"))
    val rt = withBuckets.select(col("vid").as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(rt, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(vecs.select(col("vid").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(vecs.select(col("vid").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("cos", round(
        graft.functions.VectorFunctions.cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    * 2303.09540): partition the embedding space into cells, score
    * pairwise cosine only WITHIN each cell, and drop every member that
    * has a more-canonical (lower-id) neighbor above `threshold` — the
    * survivor set of pruning near-identical ε-neighborhoods while never
    * comparing across cells (the approximation the paper makes with
    * k-means clusters).
    *
    * The cell here is ONE band of the integer-quantized sign-projection
    * LSH ([[Similarity.quantizedLshBucket]], `cellBits` sign bits):
    * unlike float k-means assignment, the cell id is exact integer
    * arithmetic, so the entire dedup decision — cells, candidate pairs,
    * survivors — is reproducible in any engine (the repo-wide mirrorable
    * pattern; d15's DuckDB oracle recomputes all of it bit-for-bit).
    *
    * Scale shape: ONE shuffle partitions vectors by cell — the window
    * that counts cell membership forces it, the skew-guard filter is
    * row-local above it, and both self-join sides share the identical
    * subtree, so the exchange plans once and the second side is a
    * ReusedExchange; the join itself sees both sides already partitioned
    * by cell. Pair volume is Σ members² per cell, bounded by `cellCap`:
    * cells larger than the cap are EXEMPT from pruning (every member
    * kept, documented recall trade — same df-cap pattern as the shingle
    * operators; a cell that big means the quantizer, not the pruner,
    * needs retuning). Vectors ride through the self-join rather than
    * re-attaching by id — no exchange beyond the shared one — and the
    * final verdict join shuffles only fixed-width (vec_id, cell) rows,
    * never vectors (dropped ids can be a large fraction of the corpus in
    * a dedup, so it is a real shuffle join, not a broadcast).
    *
    * The drop rule "exists a lower-id in-cell neighbor ≥ threshold" is
    * greedy, not transitive-closure: in a chain A~B~C (A<B<C, A≁C), B
    * drops for A and C drops for B even though B itself dropped. That is
    * SemDeDup's semantics (one survivor per ε-neighborhood, not per
    * connected component); feed [[DedupClusters.connectedComponents]]
    * with [[embeddingNearDupPairs]] when closure semantics are wanted.
    *
    * Returns one row per input: (vec_id, cell, kept). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, cellBits: Int = 8,
      cellCap: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withCell = df
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec"))
      .withColumn("cell",
        Similarity.quantizedLshBucket(col("vec"), cellBits, band = 0))
    // the ONE vector shuffle: count(*) over the cell partition — the
    // skew guard below is then row-local, no count-join
    val counted = withCell.withColumn("members",
      count(lit(1)).over(Window.partitionBy("cell")))
    // skew guard: singleton cells have no pairs; over-cap cells are exempt
    val inPlay = counted
      .filter(col("members") >= 2 && col("members") <= cellCap)
    val dropped = inPlay
      .select(col("cell"), col("vec_id").as("id_a"), col("vec").as("vec_a"))
      .join(inPlay.select(col("cell"), col("vec_id").as("id_b"),
        col("vec").as("vec_b")), "cell")
      .filter(col("id_a") < col("id_b"))
      .filter(round(graft.functions.VectorFunctions.cosine(
        col("vec_a"), col("vec_b")), 6) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    withCell.select("vec_id", "cell") // fixed-width: vectors stay behind
      .join(dropped.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("dup"), lit(false)).unary_!.as("kept"))
  }

  /** Paragraph-level exact dedup (C4 / RefinedWeb-style corpus cleaning,
    * between whole-document dedup and substring dedup in granularity):
    * split each document into paragraphs, drop every paragraph occurrence
    * except the corpus-wide FIRST (lowest (doc_id, position)) of its exact
    * content — boilerplate like cookie banners, nav bars and license
    * footers repeats across millions of pages and survives document-level
    * dedup because the surrounding text differs.
    *
    * Shape at 100 TB: one explode, then a window over the paragraph
    * fingerprint — count and first-occurrence are partial-aggregated per
    * map side before the ONE paragraph-text shuffle — then a groupBy
    * (docId) rebuild (second text shuffle). Both shuffles carry each
    * paragraph exactly once; no join, so there is no key-skew fan-out to
    * guard (a boilerplate paragraph with 10⁸ copies is one window
    * partition of flags, not 10¹⁶ join rows). The decision could be made
    * ids-only ((fingerprint, doc, pos) first, text re-joined), but that
    * join would itself shuffle the text a second time — the window form
    * is strictly cheaper.
    *
    * Returns one row per document that has at least one non-blank
    * paragraph (docs whose every paragraph is dropped as a DUPLICATE keep
    * a row with empty `cleaned_text`; all-whitespace docs produce no
    * row): (docId, n_paras, n_kept, cleaned_text). */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\\n{2,}"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = df
      .select(col(idCol).as("pd_id"),
        split(col(textCol), sepRegex).as("ps"))
      .select(col("pd_id"), posexplode(col("ps")).as(Seq("pos", "para")))
      .filter(trim(col("para")) =!= "")
      .withColumn("fp", md5(col("para").cast("binary")))
    val byFp = Window.partitionBy("fp")
    val flagged = paras
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("first_occ",
        min(struct(col("pd_id"), col("pos"))).over(byFp))
      .withColumn("keep", col("n_copies") === 1 ||
        (col("first_occ.pd_id") === col("pd_id") &&
          col("first_occ.pos") === col("pos")))
    flagged.groupBy(col("pd_id").as(idCol))
      .agg(count(lit(1)).as("n_paras"),
        sum(col("keep").cast("long")).as("n_kept"),
        // collect_list drops the nulls from when(!keep); sort restores
        // document order before the join — rebuild is deterministic
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("para"))))),
            x => x.getField("para")),
          "\n\n").as("cleaned_text"))
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003
    * — the MOSS local fingerprinting algorithm): hash every k-word gram,
    * slide a window of `w` consecutive hashes over each document, and
    * select each window's MINIMUM hash (ties → rightmost occurrence, the
    * "robust winnowing" rule). The selection guarantee is what makes it
    * an algorithm and not sampling: any shared word run of length
    * ≥ w + k − 1 is CERTAIN to contribute at least one common
    * fingerprint, while only ~2/(w+1) of all grams are kept.
    *
    * The (min hash, rightmost) rule is implemented as ONE window MIN
    * over a packed integer — 40 hash bits above 20 reversed-position
    * bits — so the whole selection is integer arithmetic an oracle
    * mirrors exactly. The 20-bit position bound (≤ 1,048,575 grams per
    * document, a ~5 MB text) is ENFORCED with raise_error, not assumed.
    *
    * Scale shape: everything before the final dedup is per-document
    * (narrow generate + a doc-partitioned window bounded by document
    * length); the output is the sampled fingerprint table — the compact
    * index you persist instead of the corpus.
    *
    * @return distinct (doc_id, fp_hash, fp_pos) — selected fingerprints
    *         with the 1-based gram position they were sampled at */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1)
    val posLimit = 1L << 20
    val grams = tokens(df, idCol, textCol)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, greatest(size(t) - $k + 1, 1)), " +
          s"i -> concat_ws(' ', slice(t, i, $k)))")).as(Seq("i", "gram")))
      .select(col("doc_id"), (col("i") + 1).as("p"), col("gram"))
    val packed = grams
      .withColumn("h40", graft.functions.TextExpressions.fnv1a64(col("gram"))
        .bitwiseAND(lit((1L << 40) - 1)))
      .withColumn("pack",
        when(col("p") < lit(posLimit),
          col("h40") * lit(posLimit) + (lit(posLimit - 1) - col("p")))
          .otherwise(raise_error(
            lit(s"winnowing: document exceeds $posLimit grams"))
            .cast("long")))
    val wSel = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, w - 1)
    val wCnt = Window.partitionBy(col("doc_id"))
    packed
      .withColumn("sel", min(col("pack")).over(wSel))
      .withColumn("g", count(lit(1)).over(wCnt))
      .filter(col("p") <= greatest(col("g") - lit(w - 1), lit(1)))
      .select(col("doc_id"),
        expr(s"sel div $posLimit").as("fp_hash"),
        (lit(posLimit - 1) - pmod(col("sel"), lit(posLimit))).as("fp_pos"))
      .distinct()
  }

  /** Fingerprint-sharing near-dup pairs over [[winnowFingerprints]]:
    * docs are matched purely through the sampled fingerprint table — the
    * corpus text is read once to fingerprint and never again. One
    * equi-join on the fingerprint hash, df-capped (a fingerprint shared
    * by more than `dfCap` docs is boilerplate and matches nothing — the
    * d04 discipline), pairs kept at ≥ `minShared` common fingerprints.
    *
    * @return (id_a, id_b, n_shared), id_a < id_b */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, dfCap: Long = 100L,
      minShared: Long = 3L): DataFrame = {
    // materialized ONCE: the fingerprint table feeds the df-cap rollup
    // and BOTH self-join branches — without the checkpoint the per-doc
    // posexplode + window selection pass recomputes three times (the r20
    // before-plan shows 8 parquet scans). This is literally the
    // "persist the sampled index instead of the corpus" shape the
    // winnowFingerprints scaladoc prescribes; rows are fixed-width
    // (doc_id, fp_hash) longs.
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .localCheckpoint()
    val rare = fps.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("fp_hash"))
    val pruned = fps.join(rare, Seq("fp_hash"), "left_semi")
    pruned.select(col("fp_hash"), col("doc_id").as("id_a"))
      .join(pruned.select(col("fp_hash"), col("doc_id").as("id_b")),
        Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
