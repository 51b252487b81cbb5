package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile: counts, nulls, exact distincts, typed-then-cast min/max") {
    val df = Seq(
      (1L, Some("en"), 10L),
      (2L, Some("de"), 9L),
      (3L, None, 10L),
      (4L, Some("en"), 2L)
    ).toDF("id", "lang", "n")
    val got = Profiler.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "lang", "n"))
    val id = got("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    val lang = got("lang")
    assert(lang.getLong(2) == 1) // one null
    assert(lang.getLong(3) == 2) // en, de — distinct ignores null
    assert(lang.getString(4) == "de" && lang.getString(5) == "en")
    // numeric min/max computed in the native type BEFORE the string
    // cast: 2 < 9 < 10 numerically even though "10" < "2" < "9"
    val n = got("n")
    assert(n.getString(4) == "2" && n.getString(5) == "10")
  }

  test("histogram: top-k per column, count-then-value order, nulls as sentinel") {
    val df = Seq(
      (Some("en"), 1L), (Some("en"), 1L), (Some("de"), 2L),
      (Some("de"), 1L), (None, 3L)
    ).toDF("lang", "n")
    val got = Profiler.histogram(df, Seq("lang", "n"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == Set(
      ("lang", "de", 2L, 1), ("lang", "en", 2L, 2), // tie at 2 → value asc
      ("n", "1", 3L, 1), ("n", "2", 1L, 2)          // tie at 1 → "2" < "3"
    ))
    // null profiled, not dropped
    val all = Profiler.histogram(df, Seq("lang"), k = 10)
      .select("value").as[String].collect().toSet
    assert(all.contains("<null>"))
  }

  test("histogram: per-column top-k pre-prunes via WindowGroupLimit") {
    val df = (1L to 500L).map(i => (s"v${i % 50}", i % 9)).toDF("a", "b")
    val plan = Profiler.histogram(df, Seq("a", "b"), k = 3)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2, s"expected group-limit rewrite:\n$plan")
  }

  test("profile: single-row aggregate plan with map-side partials") {
    val df = (1L to 100L).map(i => (i, s"s${i % 7}")).toDF("id", "s")
    val plan = Profiler.profile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    // exact multi-distinct goes through one Expand, aggregated partially
    assert(plan.contains("Expand"), s"expected Expand-based multi-distinct:\n$plan")
    assert(plan.contains("partial"), s"expected map-side partial aggregation:\n$plan")
  }

  test("drift: identical snapshots score psi 0; a shifted column scores positive") {
    val old = (1L to 300L).map(i =>
      (if (i % 3 == 0) "en" else "de", s"s${i % 4}")).toDF("lang", "source")
    val same = Profiler.drift(old, old, Seq("lang", "source")).collect()
    assert(same.length == 2 && same.forall(_.getAs[Double]("psi") == 0.0))
    // shift: drop every en row → lang drifts, source barely moves
    val shifted = old.where(col("lang") =!= "en")
    val got = Profiler.drift(old, shifted, Seq("lang", "source")).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(got("lang").getAs[Double]("psi") > got("source").getAs[Double]("psi"))
    assert(got("lang").getAs[Double]("psi") > 0.0)
    // union-of-values binning: en keeps a (smoothed) bin on both sides
    assert(got("lang").getAs[Long]("n_bins") == 2L)
    assert(got("lang").getAs[Long]("t_old") == 300L)
    assert(got("lang").getAs[Long]("t_new") == 200L)
  }

  test("correlationMatrix: exact r, NULL on zero variance, one row per pair") {
    val df = Seq(
      ("g", 1L, 2L, 7L), ("g", 2L, 4L, 7L), ("g", 3L, 6L, 7L),   // y = 2x exact
      ("h", 1L, 3L, 1L), ("h", 2L, 1L, 2L), ("h", 3L, 5L, 3L)
    ).toDF("grp0", "x", "y", "z")
    val out = Profiler.correlationMatrix(df, col("grp0"), Seq("x", "y", "z"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out.size == 6) // 2 groups x 3 pairs
    // perfectly linear → r ≈ 1 (√a·√b is not exactly √(ab), so the
    // deterministic fixed-shape result may sit 1 ulp off 1.0)
    val rG = out(("g", "x", "y"))
    assert(rG._1 == 3L && math.abs(rG._2.get - 1.0) < 1e-15)
    assert(out(("g", "x", "z")) == ((3L, None)))        // z constant: undefined
    assert(out(("g", "y", "z")) == ((3L, None)))
    // h: x=[1,2,3], y=[3,1,5] → r = 0.5 exactly (cov=1, sx²=2/3·3=2, sy²=8)
    val rH = out(("h", "x", "y"))._2.get
    assert(math.abs(rH - 0.5) < 1e-15, s"got $rH")
  }
}
