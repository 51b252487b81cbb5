package graft
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap

/** Benchmark main: times every SparkEntry query at the given SF and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  * Failures are recorded in "errors" (and the run keeps going) rather
  * than silently timing an exception.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.range(1000).selectExpr("sum(id)").collect() // session warm-up off the clock
    var errors = List.empty[String]
    val only = args.toSet // optional subset filter (driver passes none)
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) { // a typo'd subset must not time nothing, successfully
      System.err.println(s"[bench] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
    val results = ListMap(selected: _*).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes EVERY output column (count() would let
      // Catalyst prune unobserved ones and under-report map-only queries)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => errors ::= s"$name: ${e.getClass.getSimpleName}" }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errJson}""")
    spark.stop()
  }
}
