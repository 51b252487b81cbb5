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

  /** Rank-quality metrics of a retrieval run against a per-query
    * relevant set: overlap count, reciprocal rank (RR) and average
    * precision (AP@k) — the MRR/MAP row every retrieval change is
    * judged by.
    *
    * `ranked` = (query_id, nbr_id, rank) from any retriever (BM25,
    * LSH, IVF, fused); `relevant` = (query_id, nbr_id) ground truth.
    *
    * Determinism contract (the t_entropy float contract): every AP
    * term hits@r/r is a single exact-integer division (correctly
    * rounded, bit-identical in any engine), and the terms are summed
    * in CONTRACTED ascending-rank order via a fold over the sorted
    * per-query list — so the metric doubles are bit-exact, no
    * rounding needed. RR is one division off the min relevant rank.
    *
    * Scale shape: everything is bounded by queries × k rows — the
    * expensive work is the retrieval producing `ranked`, not this.
    * Queries with zero retrieved-relevant rows still get a row
    * (rr = ap = 0) via the left join from the ranked list itself.
    */
  def rankMetrics(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    val rel = ranked
      .join(relevant.select(col("query_id"), col("nbr_id"))
          .withColumn("is_rel", lit(1)),
        Seq("query_id", "nbr_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("is_rel"), lit(0)).as("rel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    rel
      .withColumn("hits", sum(col("rel")).over(w))
      .withColumn("term",
        when(col("rel") === 1, col("hits").cast("double") / col("rank"))
          .otherwise(lit(0.0)))
      .groupBy(col("query_id"))
      .agg(
        sum(col("rel")).cast("long").as("n_rel"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"),
        sort_array(collect_list(struct(col("rank"), col("term")))).as("ts"))
      .select(col("query_id"), col("n_rel"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"),
        (aggregate(col("ts"), lit(0.0),
          (acc, x) => acc + x.getField("term")) / lit(k.toDouble)).as("ap"))
  }

  /** nDCG@k with binary relevance — the position-discounted ranking
    * metric next to [[rankMetrics]]'s MRR/AP: DCG = Σ rel_i/log₂(i+1)
    * over the candidate ranking, normalized by the ideal DCG of the
    * QUERY'S FULL relevant set (min(|relevant|, k) terms packed at
    * the top) — standard nDCG. The IDCG basis is deliberately NOT
    * the retrieved-relevant count: a retriever returning 1 of 10
    * relevant items ranked first must score ≈0.22, not 1.0, or the
    * metric masks recall loss (r6 ADVICE item).
    *
    * Determinism contract: discounts are written ln(2)/ln(rank+1) —
    * NOT log2() — because Spark's Log2 is ln(x)/ln(2) while C
    * libraries compute log2 natively (different last-bit shapes);
    * both folds run in contracted ascending-rank order and the final
    * metric rounds at 6 dp. Work is queries×k-bounded.
    */
  def ndcg(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    val ln2 = log(lit(2.0))
    // per-query relevant-set SIZE (the IDCG basis) — a |queries|-row
    // aggregate, joined in alongside the retrieved-relevant count.
    val relSize = relevant.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_rel_total"))
    val rel = ranked
      .join(relevant.select(col("query_id"), col("nbr_id"))
          .withColumn("is_rel", lit(1)),
        Seq("query_id", "nbr_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("is_rel"), lit(0)).as("rel"))
    val dcgTerm = when(col("rel") === 1,
      ln2 / log((col("rank") + 1).cast("double"))).otherwise(lit(0.0))
    rel
      .groupBy(col("query_id"))
      .agg(sum(col("rel")).cast("long").as("n_rel"),
        sort_array(collect_list(struct(col("rank"), dcgTerm.as("t")))).as("ts"))
      .join(relSize, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        aggregate(col("ts"), lit(0.0), (acc, x) => acc + x.getField("t"))
          .as("dcg"),
        when(coalesce(col("n_rel_total"), lit(0L)) > 0,
          aggregate(
            sequence(lit(1),
              least(col("n_rel_total"), lit(k.toLong)).cast("int")),
            lit(0.0), (acc, i) => acc + ln2 / log((i + 1).cast("double"))))
          .otherwise(lit(0.0)).as("idcg"))
      .select(col("query_id"), col("n_rel"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"))
  }
}
