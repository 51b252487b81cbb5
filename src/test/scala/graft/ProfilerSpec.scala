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

  test("profile: single-row aggregate plan with map-side partials") {
    val df = (1L to 100L).map(i => (i, s"s${i % 7}")).toDF("id", "s")
    val plan = Profiler.profile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    // exact multi-distinct goes through one Expand, aggregated partially
    assert(plan.contains("Expand"), s"expected Expand-based multi-distinct:\n$plan")
    assert(plan.contains("partial"), s"expected map-side partial aggregation:\n$plan")
  }
}
