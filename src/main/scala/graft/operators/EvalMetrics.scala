package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation metrics for pipeline classifiers (quality filters, dedup
  * verdicts, language ID) computed EXACTLY at corpus scale.
  *
  * The scale discipline is the q52/q53 one: never sort or rank the raw
  * rows. ROC-AUC reduces to a threshold sweep over the DISTINCT-score
  * summary — one map-side partial agg to (score, n_pos, n_neg), then a
  * window over that bounded summary — which is also the tie-correct
  * Mann-Whitney formulation (each tie group contributes pos·neg/2, the
  * average-rank convention), kept in integers as
  *
  *   2U  =  Σ_s  pos_s · (2·cumNegBelow_s + neg_s)
  *   AUC =  2U / (2 · n⁺ · n⁻)
  *
  * so any engine reproduces the statistic bit-for-bit (`auc_micro` is
  * one integer division). */
object EvalMetrics {

  /** Exact tie-aware ROC-AUC of `score` against boolean `label`.
    * One output row: (n_pos, n_neg, n_scores, u2, auc_micro) with
    * auc_micro = ⌊2U·10⁶ / (2·n⁺·n⁻)⌋ — micro-units of AUC.
    * The window runs over DISTINCT scores only (summary-bounded; a
    * production sweep over a billion rows still windows over the
    * thousands of distinct thresholds).
    *
    * Degenerate single-class input (n⁺ = 0 or n⁻ = 0): AUC is undefined
    * — `auc_micro` is NULL by contract, via an explicit nullif on the
    * divisor (ANSI-mode-independent; the t24 SQL mirror pins the same
    * with NULLIF). Counts still report, so callers can distinguish
    * "undefined" from "0.5". */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = df
      .select(score.as("score"), label.as("label"))
      .groupBy("score")
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("label"), 0L).otherwise(1L)).as("neg"))
    // GLOBAL-WINDOW: bounded — runs over the per-score AGGREGATE
    // (|distinct scores| rows), never the raw corpus. Exact tie-aware
    // AUC irreducibly needs a total order over score groups; a caller
    // whose score is continuous at 100 TB must quantize it first (the
    // t24 logit is an integer dot product — already quantized). The
    // restructure path if a score domain ever explodes: repartitionByRange
    // + per-partition prefix + broadcast offsets (the p06 pattern).
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cnb", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        sum(col("pos") * (col("cnb") * 2 + col("neg"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("n_scores"), col("u2"),
        // u2 <= 2*n_pos*n_neg keeps u2 itself in Long out to ~2e9 rows a
        // side, but u2*500000 would wrap once n_pos*n_neg > ~1.8e13, so
        // the final division runs in DECIMAL(38,0) (mirrored as HUGEINT);
        // nullif makes the single-class null contract explicit and
        // ANSI-mode-independent (div-by-zero would otherwise throw)
        expr("""cast((cast(u2 as decimal(38,0)) * 500000)
                 div nullif(cast(n_pos as decimal(38,0)) * n_neg, 0)
                 as bigint)""")
          .as("auc_micro"))
  }

  /** Shared nDCG@k discount table: w(r) = ⌊10⁹ / log₂(r+1)⌋ for ranks
    * 1..k, computed ONCE on the driver and embedded as literals in both
    * the Spark plan and the SQL mirror — the only transcendental in the
    * ranking metrics, frozen into integers so every downstream sum and
    * division is engine-exact (the repo-wide mirrorable-arithmetic
    * pattern applied to log2). */
  def ndcgWeights(k: Int): Seq[Long] = {
    require(k >= 1, s"k must be >= 1: $k")
    (1 to k).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)
  }

  /** RANKING metrics of a retrieval run against binary relevance
    * judgments — the evaluation pass every retrieval/RAG deployment runs
    * (and the per-query diagnostic that finds the queries a tuned index
    * fails on): per query, hits@k, recall@k, reciprocal rank of the
    * first relevant result, and nDCG@k over the [[ndcgWeights]] integer
    * discount table.
    *
    * Exactness: ranks and hit counts are integers; rr / recall / ndcg
    * are ×10⁶-scaled integral divisions; the log₂ discounts enter as
    * the frozen integer table. Any engine reproduces every row.
    *
    * Scale shape: the run (Q·k rows) left-joins judgments on
    * (qid, doc) — a fixed-width equi-join — then one partial agg per
    * query; n_rel attaches by a second equi-join on qid. IDCG is a
    * prefix-sum lookup over the ≤ k-entry weight table (a tiny literal
    * array, never a shuffle). No corpus-sized work: inputs are already
    * top-k runs.
    *
    * @param runs (qIdCol, docIdCol, rankCol) — ranks 1-based, ≤ 1 row
    *             per (query, doc)
    * @param rels (rQidCol, rDocCol) — the relevant (query, doc) pairs
    * @return one row per query IN THE RUN: (qid, n_rel, n_ret, hits,
    *         rr_micro, recall_micro, ndcg_micro); rr 0 when nothing
    *         relevant was retrieved, recall/ndcg NULL when the query
    *         has no judged-relevant docs at all (undefined, not 0). */
  def rankingMetrics(runs: DataFrame, qIdCol: String, docIdCol: String,
      rankCol: String, rels: DataFrame, rQidCol: String, rDocCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000,
      s"k must be in [1, 1000] (keeps dcg·10⁶ inside Long): $k")
    val w = ndcgWeights(k)
    // idcg(n) = Σ w(1..min(n,k)) — prefix sums as a literal lookup array
    val idcgPrefix = w.scanLeft(0L)(_ + _).tail
    val wCol = array(w.map(lit): _*)
    val run = runs.select(col(qIdCol).cast("long").as("qid"),
      col(docIdCol).cast("long").as("did"),
      col(rankCol).cast("long").as("rnk"))
      .filter(col("rnk") <= k)
    val rel = rels.select(col(rQidCol).cast("long").as("qid"),
      col(rDocCol).cast("long").as("did"))
      .dropDuplicates("qid", "did") // defensive: a dup judgment must not
      .withColumn("is_rel", lit(1L)) // double-count a hit or inflate n_rel
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val perQ = run.join(rel, Seq("qid", "did"), "left")
      .select(col("qid"), col("rnk"), coalesce(col("is_rel"), lit(0L)).as("r"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_ret"),
        sum(col("r")).as("hits"),
        min(when(col("r") === 1L, col("rnk"))).as("first_rel"),
        sum(when(col("r") === 1L,
          element_at(wCol, col("rnk").cast("int"))).otherwise(0L))
          .as("dcg"))
    perQ.join(nRel, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_ret"), col("hits"), col("first_rel"), col("dcg"))
      // dcg ≤ Σw ≈ k·10⁹ and ×10⁶ stays far under Long.MaxValue for any
      // sane k, so the scaled division runs in pure LONG `div` —
      // truncation toward zero, DuckDB `//`-exact (never a decimal `/`,
      // whose scale rounding could round up across an integer boundary)
      .withColumn("rr_micro",
        coalesce(expr("1000000L div first_rel"), lit(0L)))
      .withColumn("recall_micro",
        expr("hits * 1000000L div nullif(n_rel, 0L)"))
      // idcg = prefix(min(n_rel, k)); n_rel = 0 keeps NULL (element_at
      // at index 0 would raise under ANSI; the metric is undefined)
      .withColumn("ndcg_micro",
        when(col("n_rel") >= 1L,
          expr(s"""dcg * 1000000L div element_at(
                    ${idcgPrefix.map(_ + "L").mkString("array(", ",", ")")},
                    cast(least(n_rel, ${k}L) as int))""")))
      .select("qid", "n_rel", "n_ret", "hits", "rr_micro", "recall_micro",
        "ndcg_micro")
  }

  /** PRECISION / RECALL / F1 across a fixed grid of `cuts` integer
    * thresholds spanning the observed score range — the threshold-
    * selection table that turns a scored corpus into a deployed filter
    * ("keep everything above t"): for each candidate cutoff, how much
    * survives (pred_pos), how much of it is actually good (precision),
    * and how much good material the cutoff forfeits (recall).
    *
    * Thresholds are derived from the same broadcast (min, max) scalar
    * pass as [[reliabilityBins]]: t_k = glo + k·(ghi − glo + 1) div cuts
    * for k = 0..cuts−1 — pure integers, so both engines build the
    * identical grid. The corpus then pays ONE map-side pass: each row
    * contributes to every threshold ≤ its score via a `cuts`-row
    * broadcast cross join + partial agg over `cuts` groups (never a
    * per-distinct-score window at corpus scale; the grid is fixed).
    *
    * `f1_micro` is computed from the ×10⁶ precision/recall micro values
    * (2·p·r div (p+r)) — at most 1 micro-unit off the unrounded harmonic
    * mean, deterministic and engine-exact, which is the repo's trade.
    *
    * @return one row per threshold: (cut, threshold, n_pred_pos, tp,
    *         precision_micro [NULL when nothing predicted positive],
    *         recall_micro [NULL when the corpus has no positives],
    *         f1_micro [NULL when either side is NULL or both are 0]). */
  def prThresholds(df: DataFrame, score: Column, label: Column,
      cuts: Int = 16): DataFrame = {
    require(cuts >= 1 && cuts <= 10000, s"cuts must be in [1, 10000]: $cuts")
    val base = df.select(score.cast("long").as("s"),
      when(label, 1L).otherwise(0L).as("y"))
    val rng = base.agg(min(col("s")).as("glo"), max(col("s")).as("ghi"),
      sum(col("y")).as("tot_pos"))
    val grid = base.sparkSession.range(cuts).toDF("cut")
      .crossJoin(broadcast(rng))
      .select(col("cut"),
        expr(s"""glo + cast(cut * (cast(ghi as decimal(38,0)) - glo + 1)
                  div $cuts as bigint)""").as("threshold"),
        col("tot_pos"))
    base.crossJoin(broadcast(grid))
      .filter(col("s") >= col("threshold"))
      .groupBy("cut", "threshold", "tot_pos")
      .agg(count(lit(1)).as("n_pred_pos"), sum(col("y")).as("tp"))
      .select(col("cut"), col("threshold"), col("n_pred_pos"), col("tp"),
        expr("""cast(cast(tp as decimal(38,0)) * 1000000
                 div nullif(n_pred_pos, 0L) as bigint)""")
          .as("precision_micro"),
        expr("""cast(cast(tp as decimal(38,0)) * 1000000
                 div nullif(tot_pos, 0L) as bigint)""").as("recall_micro"))
      .withColumn("f1_micro",
        expr("""cast(2 * cast(precision_micro as decimal(38,0))
                 * recall_micro
                 div nullif(precision_micro + recall_micro, 0L)
                 as bigint)"""))
      .orderBy("cut")
  }

  /** Shared 2×2 contingency pass for the boolean-vs-boolean eval
    * metrics ([[agreementKappa]], [[balancedAccuracy]]): ONE
    * partial-aggregated corpus pass to the one-row cell counts
    * (n, n00, n01, n10, n11); cell `nXY` counts rows with a=X, b=Y. */
  private def contingency2x2(df: DataFrame, a: Column,
      b: Column): DataFrame =
    df.select(when(a, 1L).otherwise(0L).as("ra"),
        when(b, 1L).otherwise(0L).as("rb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ra") === 0L && col("rb") === 0L, 1L).otherwise(0L))
          .as("n00"),
        sum(when(col("ra") === 0L && col("rb") === 1L, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("ra") === 1L && col("rb") === 0L, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("ra") === 1L && col("rb") === 1L, 1L).otherwise(0L))
          .as("n11"))

  /** BALANCED ACCURACY + YOUDEN'S J of a boolean prediction against a
    * boolean label — the class-imbalance-proof accuracy pair: raw
    * accuracy rewards always-predict-majority on a skewed corpus (the
    * normal case for quality filters), while bacc = (TPR + TNR)/2
    * weighs both classes equally and J = TPR + TNR − 1 is the
    * over-chance margin (0 = coin flip, 1 = perfect).
    *
    * With `pred` as rater a and `label` as rater b: TP = n11, FN = n01,
    * TN = n00, FP = n10, so TPR = n11/(n11+n01) and TNR = n00/(n00+n10).
    * Everything is ×10⁶ truncating integral division; bacc and J are
    * derived from the ALREADY-truncated micro rates (documented
    * two-stage truncation, mirrored verbatim by the t35 oracle) so no
    * float ever appears. An absent class (no positives / no negatives)
    * → NULL rate, NULL bacc/J — loud, never a silently-perfect score.
    *
    * Scale shape: identical to [[agreementKappa]] — one partial-agg
    * corpus pass, then one-row arithmetic.
    *
    * @return one row: (n, n00, n01, n10, n11, tpr_micro, tnr_micro,
    *         bacc_micro, youden_micro). */
  def balancedAccuracy(df: DataFrame, pred: Column,
      label: Column): DataFrame =
    contingency2x2(df, pred, label)
      .select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
        expr("""cast(cast(n11 as decimal(38,0)) * 1000000
                 div nullif(n11 + n01, 0L) as bigint)""").as("tpr_micro"),
        expr("""cast(cast(n00 as decimal(38,0)) * 1000000
                 div nullif(n00 + n10, 0L) as bigint)""").as("tnr_micro"))
      .select(col("*"),
        expr("cast((tpr_micro + tnr_micro) div 2 as bigint)")
          .as("bacc_micro"),
        expr("cast(tpr_micro + tnr_micro - 1000000 as bigint)")
          .as("youden_micro"))

  /** COHEN'S KAPPA agreement between two boolean raters — the
    * chance-corrected agreement statistic for comparing a cheap
    * classifier against a trusted one (or two annotators) before
    * swapping it into a pipeline: raw agreement po is inflated whenever
    * both raters lean the same way by base rate alone; kappa subtracts
    * the chance agreement pe.
    *
    * Integer-exact: with the 2×2 contingency counts (n00..n11) and the
    * marginals, kappa = (po − pe)/(1 − pe) becomes one ×10⁶ integral
    * division of integer products,
    * 10⁶·(n·(n00+n11) − (a1·b1 + a0·b0)) div (n² − (a1·b1 + a0·b0)),
    * run in DECIMAL(38,0) so n² can't wrap at corpus scale; negative
    * kappa (worse than chance) truncates toward zero in both engines.
    * Degenerate marginals (pe = 1: both raters constant) → NULL.
    *
    * Scale shape: ONE partial-aggregated pass over the corpus to the
    * four cell counts; everything after is arithmetic on one row.
    *
    * @return one row: (n, n00, n01, n10, n11, po_micro, pe_micro,
    *         kappa_micro). */
  def agreementKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = contingency2x2(df, a, b)
    cells.select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
      expr("""cast(cast(n00 + n11 as decimal(38,0)) * 1000000
               div nullif(n, 0L) as bigint)""").as("po_micro"),
      expr("""cast((cast(n10 + n11 as decimal(38,0)) * (n01 + n11)
                + cast(n00 + n01 as decimal(38,0)) * (n00 + n10))
               * 1000000
               div nullif(cast(n as decimal(38,0)) * n, 0L) as bigint)""")
        .as("pe_micro"),
      expr("""cast((cast(n as decimal(38,0)) * (n00 + n11)
                - (cast(n10 + n11 as decimal(38,0)) * (n01 + n11)
                   + cast(n00 + n01 as decimal(38,0)) * (n00 + n10)))
               * 1000000
               div nullif(cast(n as decimal(38,0)) * n
                - (cast(n10 + n11 as decimal(38,0)) * (n01 + n11)
                   + cast(n00 + n01 as decimal(38,0)) * (n00 + n10)), 0L)
               as bigint)""").as("kappa_micro"))
  }

  /** RELIABILITY (calibration) table of an integer classifier score
    * against a boolean label: `bins` equal-WIDTH bins over the observed
    * score range, each reporting how often the label is actually
    * positive — the standard reliability-diagram input that decides
    * whether a quality filter's threshold means what its score implies,
    * plus per-bin `lift_micro` (positive rate minus the corpus base
    * rate, the quantity a reviewer actually reads off the diagram).
    *
    * Equal-width on purpose: a rank-decile (global ntile) would funnel
    * the whole corpus through ONE window partition — the classic
    * unpartitioned-Window scale trap. Width binning is two passes:
    * one scalar (min, max, base-rate) agg broadcast back, then a
    * map-side bin assignment + per-bin partial agg. All arithmetic is
    * integer (DECIMAL(38,0) products against overflow at corpus scale;
    * ×10⁶ truncating divisions), so every row mirrors exactly.
    *
    * Empty bins are legitimately absent (no row landed there — the
    * reliability diagram's gaps). Degenerate all-one-score input lands
    * everything in bin 0.
    *
    * @return one row per non-empty bin: (bin, n, n_pos, lo_score,
    *         hi_score, pos_rate_micro, lift_micro), bin ∈ [0, bins). */
  def reliabilityBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    val base = df.select(score.cast("long").as("s"),
      when(label, 1L).otherwise(0L).as("y"))
    val rng = base.agg(min(col("s")).as("glo"), max(col("s")).as("ghi"),
      sum(col("y")).as("tot_pos"), count(lit(1)).as("tot"))
    base.crossJoin(broadcast(rng))
      .select(
        expr(s"""cast(cast(s - glo as decimal(38,0)) * $bins
                  div (cast(ghi as decimal(38,0)) - glo + 1) as bigint)""")
          .as("bin"),
        col("s"), col("y"), col("tot_pos"), col("tot"))
      .groupBy("bin", "tot_pos", "tot") // constants ride the key: 1 group/bin
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        min(col("s")).as("lo_score"), max(col("s")).as("hi_score"))
      .select(col("bin"), col("n"), col("n_pos"), col("lo_score"),
        col("hi_score"),
        expr("cast(cast(n_pos as decimal(38,0)) * 1000000 div n as bigint)")
          .as("pos_rate_micro"),
        expr("""cast(cast(n_pos as decimal(38,0)) * 1000000 div n
                 - cast(tot_pos as decimal(38,0)) * 1000000 div tot
                 as bigint)""").as("lift_micro"))
      .orderBy("bin")
  }
}
