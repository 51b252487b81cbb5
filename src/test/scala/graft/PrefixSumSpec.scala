package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PrefixSum — the distributed two-phase scan that replaces
  * single-partition `Window.orderBy(key)` windows (q_ks_test /
  * q_pareto, r6 verdict). Parity is asserted against the global-window
  * ground truth on data with duplicate sum values, negative values,
  * and bucket counts spanning 1 (degenerate: one range bucket) to
  * more buckets than rows (empty buckets).
  */
class PrefixSumSpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = (0 until 997).map { i =>
    // unique order key, duplicate-heavy and sign-mixed values
    (i.toLong * 7 % 997, (i % 13).toLong - 3, (i % 5).toLong)
  }

  test("prefixSums matches the single-partition window at any bucket count") {
    val df = rows.toDF("k", "v1", "v2")
    val wg = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .select(col("k"), sum(col("v1")).over(wg).as("s1"),
        sum(col("v2")).over(wg).as("s2"),
        row_number().over(Window.orderBy(col("k"))).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for (nb <- Seq(1, 3, 32, 2048)) {
      val got = PrefixSum.prefixSums(df, Seq(col("k")),
          Seq("s1" -> col("v1"), "s2" -> col("v2")),
          rowNum = Some("rn"), buckets = nb)
        .select(col("k"), col("s1"), col("s2"), col("rn"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == expected, s"mismatch at buckets=$nb")
    }
  }

  test("prefixSums passes input columns through and adds nothing else") {
    val df = rows.toDF("k", "v1", "v2")
    val out = PrefixSum.prefixSums(df, Seq(col("k")), Seq("s" -> col("v1")))
    assert(out.columns.sorted.toSeq == Seq("k", "s", "v1", "v2"))
  }

  test("prefixSums plan has no single-partition unpartitioned window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = rows.toDF("k", "v1", "v2")
    val out = PrefixSum.prefixSums(df, Seq(col("k")),
      Seq("s" -> col("v1")), rowNum = Some("rn"))
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = out.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        "PrefixSum must never emit a no-partition WindowExec")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
