package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-based document loading — the Spark twin of the reference's
  * file readers (MarkdownReader.ReadAsync(FileInfo),
  * IngestionPipeline.ProcessAsync(DirectoryInfo)): a directory of
  * markdown/text files becomes a `documents` DataFrame, one row per
  * file.
  *
  * `wholetext` keeps one file per row (a document is the parse unit);
  * Spark still parallelizes across files and a 100 TB corpus of small
  * files is bounded by listing + IO, not by this operator. The stable
  * document id is a 64-bit hash of the relative path so re-ingestion
  * of the same file overwrites rather than duplicates (the reference's
  * incremental-ingestion key is the source file identity too,
  * VectorStoreWriter.cs IncrementalIngestion).
  */
object DocumentSource {

  /** Read every file matching `glob` under `dir` as one document row:
    * (doc_id, text, source).
    */
  def readDir(spark: SparkSession, dir: String, glob: String = "*.md"): DataFrame =
    spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .text(dir)
      .select(
        xxhash64(input_file_name()).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("source")
      )

  /** Streaming variant: watch `dir` and emit new files as documents. */
  def streamDir(spark: SparkSession, dir: String, glob: String = "*.md",
                maxFilesPerTrigger: Int = 32): DataFrame =
    spark.readStream
      .option("wholetext", "true")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .select(
        xxhash64(input_file_name()).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("source")
      )
}
