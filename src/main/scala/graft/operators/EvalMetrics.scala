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
}
