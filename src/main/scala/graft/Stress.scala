package graft
import org.apache.spark.sql.functions._
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def corpus(mult: Int) = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
    for (mult <- Seq(1, 4, 20)) {
      val docs = corpus(mult)
      val t0 = System.nanoTime()
      val out = pipeline.IngestionPipeline.canonical.chunks(spark, docs)
      val n = sinks.VectorStoreWriter.toVectorRecords(out, 64,
        pipeline.IngestionPipeline.metadataColumns(out))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS mult=$mult docs=${5000 * mult} pipeline+embed secs=$dt%.1f")
    }
    spark.stop()
  }
}
