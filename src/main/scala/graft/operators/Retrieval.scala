package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the classic bag-of-words
  * relevance scorer (Robertson/Sparck Jones; the Lucene `ln(1 + ...)`
  * positive-idf variant), as a declarative Spark plan:
  *
  *  - doc length rides the explode row-locally (an int per posting), so
  *    tf, dl and df all come out of ONE fixed-width partial-agg shuffle
  *    of (doc, term) rows — the corpus text itself never re-shuffles;
  *  - the query-term table is broadcast and applied BEFORE the tf
  *    aggregation, so only postings of query terms are ever aggregated;
  *  - corpus scalars (N, avgdl) are a 1-row aggregate cross-joined in
  *    (Spark plans it as a broadcast);
  *  - per-(query, doc) scores sum the per-term contributions through a
  *    SORTED deterministic fold (`aggregate` over `array_sort`ed
  *    structs), not a float SUM whose accumulation order is
  *    partition-dependent — scores are bit-stable run to run and
  *    engine to engine except for `ln` (JVM vs libm: ±1 ulp), which the
  *    caller absorbs by ranking on a rounded score;
  *  - top-k per query via a rank window partitioned by query — bounded
  *    by the per-query candidate set (docs sharing ≥1 query term).
  *
  * Returns (queryIdCol, rank, docIdCol, score) with score rounded to 4
  * decimals and rank ties broken by doc id. */
object Retrieval {

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    // tokenize ONCE per row: size() lives in the Project and explode() in
    // the Generate operator, so referencing `words` in both would evaluate
    // the split+lower+trim chain twice per row (codegen CSE cannot cross
    // operators) — materialize the array as a column first
    val tokenized = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), words.as("w"))
    // (doc, term, dl) postings; dl rides along row-locally
    val postings = tokenized
      .select(col(idCol), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
    val qterms = queries.select(col(queryIdCol),
      explode(split(lower(trim(col(queryTextCol))), "\\s+")).as("term"))
      .distinct()
    // restrict to query terms BEFORE aggregating — the broadcast prunes
    // the posting stream down to matching terms only
    // materialized ONCE: matched feeds BOTH the df rollup and the term
    // scoring join — without the checkpoint each consumer re-runs the
    // corpus scan + posting explode + tf aggregation (2 extra full
    // passes in the plan). Bounded by postings of QUERY terms only, so
    // at 100 TB this is the per-query candidate table, not the corpus.
    val matched = postings
      .join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val corpus = docs.filter(trim(col(textCol)) =!= "")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words).cast("long")).as("sum_dl"))
    val dfreq = matched.groupBy("term")
      .agg(count(lit(1)).as("df")) // one row per (doc, term) → df
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val termScores = matched
      .join(dfreq, "term")
      .crossJoin(broadcast(corpus))
      .join(broadcast(qterms), "term")
      .select(col(queryIdCol), col(idCol), col("term"),
        (idf * tfNorm).as("term_score"))
    // deterministic fold in term order — NOT a float SUM (see scaladoc)
    val scored = termScores
      .groupBy(col(queryIdCol), col(idCol))
      .agg(aggregate(
        transform(
          array_sort(collect_list(struct(col("term"), col("term_score")))),
          x => x.getField("term_score")),
        lit(0.0), (acc, x) => acc + x).as("score_full"))
      .withColumn("score", round(col("score_full"), 4))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("score").desc, col(idCol).asc)).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col(queryIdCol), col("rank"), col(idCol), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) of two
    * per-query ranked candidate lists — the standard hybrid-retrieval
    * combiner: fuse a lexical ranking ([[bm25TopK]]) with a vector
    * ranking ([[Similarity.bruteForceTopK]] / the quantized ANN path)
    * without comparing their incommensurable scores, only their ranks.
    *
    * INTEGER-EXACT on purpose (the [[Graph]] fixed-point policy): each
    * list contributes `scale div (kRrf + rank)` micro-units, so fused
    * scores are BIGINTs — order-independent to sum and bit-mirrorable —
    * rather than the usual 1/(k+r) floats. Ties break by ascending id.
    *
    * Scale shape: inputs are per-query TOP-K lists, already bounded, so
    * the full-outer fuse join and the re-rank window touch ≤ |A|+|B|
    * rows per query — at 100 TB the expensive part is PRODUCING the
    * rankings (which scale as their own operators); fusion itself is a
    * fixed-width equi-join keyed by (query, id).
    *
    * @return (queryCol, rank, idCol, rrf_micro, rank_a, rank_b); rank_a
    *         / rank_b are NULL where a list did not surface the id. */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String, idCol: String,
      rankCol: String, kRrf: Int = 60, topK: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    // kRrf = 0 with 0-based ranks would integer-divide by zero, which
    // Spark's non-ANSI div turns into NULL → coalesce → a silent 0 score;
    // the standard RRF constant is ≥ 1, so reject the degenerate value
    require(kRrf >= 1 && topK >= 1 && scale >= 1)
    val fa = a.select(col(queryCol), col(idCol),
      col(rankCol).cast("long").as("rank_a"))
    val fb = b.select(col(queryCol), col(idCol),
      col(rankCol).cast("long").as("rank_b"))
    fa.join(fb, Seq(queryCol, idCol), "full_outer")
      .select(col(queryCol), col(idCol),
        (coalesce(expr(s"${scale}L div ($kRrf + rank_a)"), lit(0L)) +
          coalesce(expr(s"${scale}L div ($kRrf + rank_b)"), lit(0L)))
          .as("rrf_micro"),
        col("rank_a"), col("rank_b"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("rrf_micro").desc, col(idCol).asc)).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col("rank"), col(idCol), col("rrf_micro"),
        col("rank_a"), col("rank_b"))
  }

  /** MMR — maximal marginal relevance (Carbonell & Goldstein 1998):
    * greedily select k items maximizing
    * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), the classic
    * relevance-vs-redundancy re-rank retrieval and data-selection
    * pipelines run over a bounded candidate pool.
    *
    * Spark-first shape: greedy selection is inherently sequential in k,
    * so this runs k FIXED rounds of declarative jobs (the d12/g01
    * fixed-round discipline) over the localCheckpointed candidate pool —
    * each round is one anti-join (drop already-selected), one broadcast
    * join against the ≤ k selected vectors, one partial-aggregated
    * max-sim rollup, and a top-1 pick. The pool is top-N from a
    * DISTRIBUTED retrieval stage (s01/t16/t20), so at 100 TB the corpus
    * is never touched here — N stays bounded by construction and only
    * (id, vector, rel) rows ever move.
    *
    * Determinism: rel and every pairwise sim are rounded to 6 decimals
    * BEFORE scoring; the score is the fixed IEEE form
    * 0.7·rel − 0.3·maxsim (λ hard-coded rational), ties break on id
    * ascending — an oracle replays the greedy walk exactly.
    *
    * @param cand bounded candidate pool: (idCol, vecCol, relCol)
    * @return (step, idCol, rel, maxsim, mmr) — the k picks in order */
  def mmrSelect(cand: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val c = cand.select(col(idCol), col(vecCol).as("__v"),
      col(relCol).as("rel")).localCheckpoint()
    def score(rel: Column, maxsim: Column): Column =
      lit(0.7d) * rel - lit(0.3d) * maxsim
    val first = c
      .orderBy(col("rel").desc, col(idCol).asc).limit(1)
      .select(lit(1).as("step"), col(idCol), col("rel"),
        lit(0.0d).as("maxsim"),
        round(score(col("rel"), lit(0.0d)), 6).as("mmr"), col("__v"))
    var selected = first.localCheckpoint()
    var step = 2
    while (step <= k) {
      val selVecs = selected.select(col(idCol).as("__sid"),
        col("__v").as("__sv"))
      val next = c
        .join(selected.select(col(idCol)), Seq(idCol), "left_anti")
        .crossJoin(broadcast(selVecs))
        .select(col(idCol), col("rel"),
          round(VectorFunctions.cosine(col("__v"), col("__sv")), 6)
            .as("__sim"), col("__v"))
        .groupBy(col(idCol))
        .agg(first_value(col("rel")).as("rel"), max(col("__sim")).as("maxsim"),
          first_value(col("__v")).as("__v"))
        .withColumn("mmr", round(score(col("rel"), col("maxsim")), 6))
        .orderBy(col("mmr").desc, col(idCol).asc).limit(1)
        .select(lit(step).as("step"), col(idCol), col("rel"), col("maxsim"),
          col("mmr"), col("__v"))
      selected = selected.unionByName(next).localCheckpoint()
      step += 1
    }
    selected.select(col("step"), col(idCol), col("rel"), col("maxsim"),
      col("mmr"))
  }
}
