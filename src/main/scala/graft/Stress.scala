package graft
import org.apache.spark.sql.functions._
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // replicate via explode AFTER spreading the 5k base docs over the
    // cores — models a many-split 100 TB input (a 20-way self-union
    // instead would 20× the codegen stage and keep 20 partitions)
    def corpus(mult: Int) = base
      .repartition(64)
      .select(explode(sequence(lit(0), lit(mult - 1))).as("rep"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"), col("text"))
    for (mult <- Seq(1, 4, 20)) {
      val docs = corpus(mult)
      val t0 = System.nanoTime()
      val out = pipeline.IngestionPipeline.canonical.chunks(spark, docs)
      sinks.VectorStoreWriter.toVectorRecords(out, 64,
        pipeline.IngestionPipeline.metadataColumns(out))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS mult=$mult docs=${5000 * mult} pipeline+embed secs=$dt%.1f")
    }
    spark.stop()
  }
}
