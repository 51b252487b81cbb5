package graft
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // summarize: count exchanges, scans, reused
      val lines = plan.linesIterator.toSeq
      println("Exchanges: " + lines.count(_.contains("Exchange")))
      println("FileScans: " + lines.count(_.trim.startsWith("FileScan") || lines.exists(_ => false)))
      lines.filter(l => l.contains("Exchange") || l.contains("FileScan") || l.contains("ReusedExchange") || l.contains("Join") || l.contains("HashAggregate(keys=[")).take(30).foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
