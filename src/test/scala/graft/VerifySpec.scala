package graft

import org.apache.spark.sql.functions._

/** The Verify-side driver-compare portability guard (SURVEY §6): any
  * query whose output schema carries array/map columns would crash the
  * driver's pandas hash-compare (`unhashable type: numpy.ndarray` —
  * the round-6 q_calendar_gaps failure). Verify now refuses to write
  * such a result; this spec pins the detector.
  */
class VerifySpec extends SparkSpecBase {
  import spark.implicits._

  test("nonScalarColumns flags array and map outputs, passes scalars") {
    val df = Seq((1L, "x")).toDF("id", "s")
      .withColumn("arr", array(lit(1L), lit(2L)))
      .withColumn("m", map(lit("k"), lit("v")))
      .withColumn("st", struct(lit(1L).as("a")))              // struct of scalars
      .withColumn("nested", struct(array(lit(1L)).as("xs")))  // array inside struct
      .withColumn("d", lit(1.5))
    val bad = Verify.nonScalarColumns(df.schema)
    assert(bad.exists(_.startsWith("arr:")))
    assert(bad.exists(_.startsWith("m:")))
    assert(bad.exists(_.startsWith("st:")))
    assert(bad.exists(_.startsWith("nested:")))
    assert(bad.size == 4)
    val ok = Verify.nonScalarColumns(
      df.select(col("id"), col("s"), col("d"),
        array_join(col("arr").cast("array<string>"), ",").as("arr")).schema)
    assert(ok.isEmpty)
  }

  test("every SparkEntry query output schema is driver-compare safe") {
    // cheap static sweep: build each query's DataFrame against sf0.001
    // (no execution — schema resolution only) and assert no array/map
    // column survives to the output. This makes the q_calendar_gaps
    // class unrepresentable at spec time, before Verify even runs.
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val bad =
        try Verify.nonScalarColumns(fn(spark, sf("sf0.001")).schema)
        catch { case _: Throwable => Nil } // runtime-only issues: other specs' job
      if (bad.nonEmpty) Some(s"$name(${bad.mkString(", ")})") else None
    }
    assert(offenders.isEmpty, s"non-scalar query outputs: $offenders")
  }
}
