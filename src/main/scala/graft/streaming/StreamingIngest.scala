package graft.streaming

import graft.pipeline.IngestionPipeline
import graft.sinks.VectorStoreWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingestion: the reference pipeline's
  * directory-watching mode (IngestionPipeline.ProcessAsync(DirectoryInfo)
  * — IngestionPipeline.cs:48) becomes a file-source stream, so new
  * documents are chunked/enriched/embedded continuously with
  * exactly-once sink semantics from checkpointing.
  *
  * Because every ingestion stage is a narrow column transform, the
  * whole pipeline is trivially streamable — no state, no watermark
  * needed; stateful pieces (windowed event aggregation) live in
  * `eventWindowCounts`.
  */
object StreamingIngest {

  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)
  ))

  /** Watch a directory of json documents and emit enriched chunks. */
  def chunkStream(spark: SparkSession, inputDir: String,
                  pipeline: IngestionPipeline = IngestionPipeline.canonical): DataFrame = {
    val docs = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", 32) // bound batch size: steady memory at any backlog
      .json(inputDir)
    pipeline.chunks(spark, docs)
  }

  /** Write the chunk stream as vector records (append mode, checkpointed). */
  def writer(chunks: DataFrame, sinkPath: String, checkpoint: String,
             dim: Int = 64): DataStreamWriter[org.apache.spark.sql.Row] =
    VectorStoreWriter.toVectorRecords(chunks, dim)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .option("path", sinkPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet")

  /** Watermarked tumbling-window event aggregation: the canonical
    * stateful-streaming operator (SIGMOD'18 Structured Streaming
    * windowed aggregation shape). 10-minute windows, 20-minute
    * watermark for late data.
    */
  def eventWindowCounts(events: DataFrame,
                        windowLen: String = "10 minutes",
                        watermark: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value")
      )
}
