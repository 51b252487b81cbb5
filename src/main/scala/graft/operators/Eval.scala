package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for scores and rankings produced by the
  * pipeline's classifiers and retrievers (quality scores, language
  * ID, NB classifier, BM25/ANN rankings).
  *
  * A data-curation run is full of learned or heuristic scores whose
  * only justification is "they rank good documents above bad ones" —
  * AUC is the standard measurement of exactly that claim, and
  * rank-quality metrics (MRR, nDCG) are the retrieval equivalent.
  * These belong in the engine because at corpus scale they are
  * aggregation problems, not sklearn calls.
  */
object Eval {

  /** Exact ROC AUC of an integer score against a binary label, per
    * group — the Mann-Whitney U statistic with average-rank tie
    * handling, computed WITHOUT a corpus-wide rank window.
    *
    * Scale shape: the corpus reduces in ONE map-side-combined
    * aggregate to the per-(group, score) histogram (bounded by the
    * score's cardinality, not the corpus), and the rank-sum folds
    * over that bounded table with a per-group window. Nothing
    * corpus-sized is sorted or shuffled twice.
    *
    * Exactness: with integer scores every quantity up to the final
    * division is an exact integer — 2·U = Σ_levels np·(2·cum_neg + nn)
    * (the doubled average-rank form, so ties stay integral) — and the
    * division is one fixed-shape double expression, bit-identical
    * across engines. u2 accumulates in decimal(38,0): np·2·cum_neg is
    * O(n²) and overflows int64 at ~3·10⁹ rows per group (the ANSI
    * overflow class the sf3 probe caught in q_outliers).
    *
    * Returns (group, n_pos, n_neg, u2, auc); auc is NULL when either
    * class is empty (undefined, not 0 — a one-class group is a data
    * problem the caller should see).
    */
  def auc(df: DataFrame, group: Column, score: Column, label: Column): DataFrame = {
    val hist = df
      .select(group.as("grp"), score.cast("long").as("score"),
        label.cast("long").as("pos"))
      .groupBy(col("grp"), col("score"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
      .withColumn("nn", col("n") - col("np"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_neg", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        sum((col("np") * (lit(2L) * col("cum_neg") + col("nn")))
          .cast("decimal(38,0)")).as("u2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))))
  }
}
