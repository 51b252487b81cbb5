package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the scale-safe replacement for
  * `Window.orderBy(key)` with NO `partitionBy`, which moves the whole
  * input to ONE partition (Spark logs "No Partition Defined for Window
  * operation"; at 100 TB that is billions of rows sorted on one core).
  *
  * Two-phase shape (the classic distributed scan / MPI-exscan):
  *   1. range-partition the input on the order key, so partition i
  *      holds strictly smaller keys than partition i+1 (the same
  *      contract Spark's own global `orderBy` builds on);
  *   2. per-partition running sums via an ordinary PARTITIONED window
  *      (each bucket sorts locally, in parallel);
  *   3. one |buckets|-row aggregate of per-bucket totals → exclusive
  *      per-bucket offsets (a bounded table: ≤ `buckets` rows no
  *      matter the input size) broadcast back and added.
  *
  * The caller's order key (`orderCols` as a tuple) MUST be unique per
  * row — ties straddling a range boundary would otherwise make the
  * "running" sum partition-placement-dependent. Every graft call site
  * orders by a key that is unique by construction (a groupBy key, or
  * key + tiebreaker).
  *
  * Emits, per requested (`name` → value column): a running-inclusive
  * sum column `name` (sum over all rows with order key ≤ this row's,
  * this row included), and optionally a global 1-based `rowNum`
  * column. Input columns all pass through; the helper adds columns.
  */
object PrefixSum {

  def prefixSums(
      df: DataFrame,
      orderCols: Seq[Column],
      sums: Seq[(String, Column)],
      rowNum: Option[String] = None,
      buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb =
      if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Phase 1: range partition. Spark's RangePartitioner assigns
    // ascending key ranges to ascending partition ids (this is the
    // mechanism under global orderBy), so spark_partition_id() IS the
    // range-bucket number.
    val ranged = df.repartitionByRange(nb, orderCols: _*)
      .withColumn("__psum_pid", spark_partition_id())
    // Phase 2: per-bucket (partitioned — parallel) running sums.
    val wLoc = Window.partitionBy(col("__psum_pid")).orderBy(orderCols: _*)
    val wLocCum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = ranged
    sums.foreach { case (name, value) =>
      local = local.withColumn(s"__psum_loc_$name", sum(value).over(wLocCum))
    }
    rowNum.foreach { name =>
      local = local.withColumn(s"__psum_loc_$name",
        row_number().over(wLoc).cast("long"))
    }
    // Phase 3: per-bucket totals → exclusive offsets. The totals table
    // is ≤ nb rows by construction (bucket count, not data size), so a
    // triangular self-join (strictly-smaller bucket ids) computes the
    // exclusive prefix over it in O(nb²) bounded work — deliberately
    // NOT a global window: even a bounded one would reintroduce the
    // single-partition WindowExec class this helper exists to kill
    // (and Spark 4's EliminateWindowPartitions folds a literal
    // partitionBy away).
    val aggs = sums.map { case (name, value) =>
      sum(value).as(s"__psum_tot_$name")
    } ++ rowNum.map(name => count(lit(1)).as(s"__psum_tot_$name"))
    val totals = local.groupBy(col("__psum_pid")).agg(aggs.head, aggs.tail: _*)
    val names = sums.map(_._1) ++ rowNum.toSeq
    val prior = totals.select(
      col("__psum_pid").as("__psum_prior_pid") +:
        names.map(name => col(s"__psum_tot_$name")): _*)
    val offsets = totals.select(col("__psum_pid"))
      .join(broadcast(prior), col("__psum_prior_pid") < col("__psum_pid"), "left")
      .groupBy(col("__psum_pid"))
      .agg(
        names.map { name =>
          coalesce(sum(col(s"__psum_tot_$name")), lit(0L))
            .as(s"__psum_off_$name")
        }.head,
        names.map { name =>
          coalesce(sum(col(s"__psum_tot_$name")), lit(0L))
            .as(s"__psum_off_$name")
        }.tail: _*)
    // offsets is bucket-bounded — broadcast, never a shuffle of `local`.
    var out = local.join(broadcast(offsets), Seq("__psum_pid"))
    names.foreach { name =>
      out = out.withColumn(name,
        col(s"__psum_off_$name") + col(s"__psum_loc_$name"))
        .drop(s"__psum_off_$name", s"__psum_loc_$name", s"__psum_tot_$name")
    }
    out.drop("__psum_pid")
  }
}
