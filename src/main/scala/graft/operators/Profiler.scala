package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the DESCRIBE/data-quality pass every ingestion
  * run wants before training on a new drop: per-column row count,
  * null count, exact distinct count, and min/max (rendered as strings
  * so one result schema covers every input type; numeric min/max is
  * computed in the NATIVE type first and cast after, so "10" < "9"
  * lexicographic traps don't apply).
  *
  * Shape: ONE aggregate pass over the input. Multiple exact
  * `count(DISTINCT col)`s in a single agg become one Expand-based
  * plan (rows × (|cols|+1)) — the standard Spark shape for exact
  * multi-distinct; partial aggregation still combines map-side, and
  * the result is a single row that is then unpivoted driver-free via
  * explode over an in-row struct array. At 100 TB, exact distinct on
  * a near-unique column shuffles that column's values once — when the
  * contract allows it, the approx twin (HLL sketches, see
  * q_approx_sketch) profiles in fixed memory; this operator is the
  * exact-gate version.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def n(c: String, what: String) = s"${c}__$what"
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(n(c, "nonnull")),
        countDistinct(col(c)).as(n(c, "distinct")),
        min(col(c)).cast("string").as(n(c, "min")),
        max(col(c)).cast("string").as(n(c, "max")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pieces = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(n(c, "nonnull"))).as("n_null"),
        col(n(c, "distinct")).as("n_distinct"),
        col(n(c, "min")).as("min_value"),
        col(n(c, "max")).as("max_value"))
    }
    one.select(explode(array(pieces: _*)).as("p")).select(col("p.*"))
  }

  /** Top-k most frequent values per column — the other half of the
    * data-quality pass (what IS in this column, not just how many):
    * skew detection, category drift, junk sentinel values. ONE scan
    * explodes each row into (column, value-as-string) pairs, a
    * two-key aggregate map-side combines to ≤Σ|distinct| rows, and
    * the per-column top-k (count desc, value asc — total order, so
    * ties are deterministic) rewrites to partial+final
    * WindowGroupLimit like [[Corpus.balancedSample]]: map tasks
    * pre-prune before the exchange. Nulls are profiled as the
    * sentinel "<null>" rather than dropped.
    */
  def histogram(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty && k > 0, "histogram needs columns and k > 0")
    val pairs = df.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"),
        coalesce(col(c).cast("string"), lit("<null>")).as("value"))
    }: _*)).as("p")).select(col("p.*"))
    val counts = pairs.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column"))
      .orderBy(col("cnt").desc, col("value").asc)
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Distribution drift between two snapshots — per-column Population
    * Stability Index over categorical value histograms, the standard
    * "did this data drop change shape" gate before a new corpus
    * version enters training (PSI < 0.1 stable / > 0.25 shifted, by
    * the usual credit-scoring convention). Bins are the union of
    * values seen on either side (nulls as the "<null>" sentinel);
    * shares are Laplace-smoothed ((n+1)/(t+bins)) so one-sided bins
    * keep ln finite without dropping mass. psi = Σ (p_new − p_old) ·
    * ln(p_new / p_old), rounded to 6 dp (the dsirWeights float
    * contract); integer n_bins / t_old / t_new anchor the gate
    * exactly.
    *
    * Scale shape: each snapshot reduces in ONE scan to a map-side-
    * combined (column, value) histogram ≤ Σ|distinct| rows ≪ corpus;
    * the full-outer bin join, totals, and the psi sum all run on
    * bounded histogram tables. Nothing corpus-sized ever shuffles.
    */
  def drift(oldDf: DataFrame, newDf: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "drift needs at least one column")
    def hist(df: DataFrame, side: String) =
      df.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          coalesce(col(c).cast("string"), lit("<null>")).as("value"))
      }: _*)).as("p")).select(col("p.*"))
        .groupBy(col("column"), col("value"))
        .agg(count(lit(1)).as(side))
    val bins = hist(oldDf, "n_old")
      .join(hist(newDf, "n_new"), Seq("column", "value"), "full_outer")
      .select(col("column"), col("value"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = bins.groupBy(col("column")).agg(
      sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"),
      count(lit(1)).as("n_bins"))
    val pOld = (col("n_old") + lit(1)) / (col("t_old") + col("n_bins"))
    val pNew = (col("n_new") + lit(1)) / (col("t_new") + col("n_bins"))
    bins.join(broadcast(totals), Seq("column"))
      .select(col("column"), col("n_bins"), col("t_old"), col("t_new"),
        ((pNew - pOld) * log(pNew / pOld)).as("term"))
      .groupBy(col("column"))
      .agg(first(col("n_bins")).as("n_bins"),
        first(col("t_old")).as("t_old"), first(col("t_new")).as("t_new"),
        round(sum(col("term")), 6).as("psi"))
  }

  /** Pairwise Pearson correlation matrix over INTEGER-VALUED columns,
    * per group, in ONE aggregate pass — the relationship half of the
    * profiling pass (profile/histogram describe columns alone; this
    * is the "is price driven by quantity" cross-column row).
    *
    * Exactness contract: inputs must be integral (callers encode
    * money as cents etc. — the corpus-wide convention); every
    * sufficient statistic (Σx, Σx², Σxy, n) is then an EXACT
    * decimal(38,0) integer at any parallelism, and the final
    * r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    * is a fixed-shape double expression over casts of exact integers
    * — bit-identical across engines (sqrt and ÷ are correctly-rounded
    * IEEE ops). Zero-variance columns yield NULL (undefined, visible).
    * Headroom: nΣx² stays inside decimal(38,0)/int128 up to ~10¹¹
    * rows of 7-digit values — the q_outliers decimal-sum lesson.
    *
    * Shape: one map-side-combined aggregate to |groups| rows carrying
    * |cols| + |cols| + C(|cols|,2) sums, unpivoted in-row to
    * (grp, col_x, col_y, n, corr). Nothing else touches the corpus.
    */
  def correlationMatrix(df: DataFrame, group: Column,
                        cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val d38 = "decimal(38,0)"
    def d(c: String) = col(c).cast(d38)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs: Seq[Column] =
      count(lit(1)).cast(d38).as("n") +:
        (cols.map(c => sum(d(c)).as(s"s_$c")) ++
          cols.map(c => sum(d(c) * d(c)).as(s"ss_$c")) ++
          pairs.map { case (a, b) => sum(d(a) * d(b)).as(s"sp_${a}_${b}") })
    val agg = df.groupBy(group.as("grp")).agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val varA = col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")
      val varB = col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")
      val num = col("n") * col(s"sp_${a}_${b}") - col(s"s_$a") * col(s"s_$b")
      agg.select(col("grp"), lit(a).as("col_x"), lit(b).as("col_y"),
        col("n").cast("long").as("n"),
        when(varA > 0 && varB > 0,
          num.cast("double") /
            (sqrt(varA.cast("double")) * sqrt(varB.cast("double"))))
          .as("corr"))
    }
    rows.reduce(_ unionByName _)
  }
}
