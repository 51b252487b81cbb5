package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructType}

/** Pluggable model-client seam for the enrichers — the Spark twin of
  * the reference's `IChatClient` constructor argument
  * (Processors/SummaryEnricher.cs:25-36, ClassificationEnricher.cs):
  * every reference enricher is "build a prompt per chunk, ask the
  * client, store the reply under a metadata key". graft's default
  * enrichers (Processors.withSummary & co.) are deterministic column
  * expressions — right for a hermetic oracle and the fastest possible
  * plan — but a production deployment points the SAME pipeline at a
  * real model endpoint. This seam follows the ExternalReader pattern
  * (sources/ExternalReader.scala): the client runs inside
  * mapPartitions with explicit batches (one client per partition,
  * setup amortized per batch, backpressure by partition count) and a
  * per-row error channel, because at corpus scale some calls always
  * fail and a failed enrichment must not kill the job — or silently
  * pass as an enriched row.
  */
object ClientEnricher {

  /** One prompt in, one completion out, batched. Implementations must
    * be Serializable (shipped to executors) and thread-compatible
    * within a partition. A thrown exception fails the BATCH (every row
    * in it gets the error); a null element fails that ROW.
    */
  trait ChatClient extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Deterministic stand-in with the same contract: echoes the first
    * `maxWords` whitespace tokens of the prompt BODY (everything after
    * the first newline, matching [[prompt]]'s instruction-then-content
    * layout) — the client-seam twin of Processors.withSummary's
    * extractive column expression.
    */
  final case class ExtractiveClient(maxWords: Int = 100) extends ChatClient {
    def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      val body = p.indexOf('\n') match {
        case -1 => p
        case i  => p.substring(i + 1)
      }
      body.split("\\s+").filter(_.nonEmpty).take(maxWords).mkString(" ")
    }
  }

  /** The reference's prompt layout: one instruction line, then the
    * chunk content (SummaryEnricher.cs:55-58 sends exactly these two
    * text parts).
    */
  def prompt(instruction: String)(content: String): String =
    instruction + "\n" + (if (content == null) "" else content)

  def summaryPrompt(maxWords: Int = 100): String => String =
    prompt(s"Write a summary text for this text with less than $maxWords words. " +
      "Return just the summary.")

  /** Enrich `df` with `outputCol` = client(promptOf(textCol)), keeping
    * every existing column, plus `outputCol_error` (null on success —
    * the per-row error channel). Rows whose call failed carry a null
    * enrichment and the error string; callers route them like
    * ExternalReader error rows (retry topic, quarantine, drop).
    *
    * Scale shape: narrow mapPartitions (no shuffle, no driver
    * round-trip); batches bound client latency amortization and memory
    * (`batchSize` rows of prompts in flight per partition). The output
    * encoder is built from the input schema, so this composes at any
    * point of the chunk pipeline.
    */
  def enrich(df: DataFrame, client: ChatClient, outputCol: String,
             promptOf: String => String, textCol: String = "content",
             batchSize: Int = 16): DataFrame = {
    val errorCol = outputCol + "_error"
    require(!df.columns.contains(outputCol) && !df.columns.contains(errorCol),
      s"column $outputCol / $errorCol already present")
    val outSchema = StructType(df.schema.fields)
      .add(outputCol, StringType, nullable = true)
      .add(errorCol, StringType, nullable = true)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val completions: Seq[(String, String)] =
          try {
            val out = client.complete(batch.map(r => promptOf(r.getString(textIdx))))
            if (out.length != batch.length)
              batch.map(_ => (null: String,
                s"client returned ${out.length} completions for ${batch.length} prompts"))
            else out.map {
              case null => (null: String, "client returned null completion")
              case s    => (s, null: String)
            }
          } catch {
            // e.toString, not getMessage: a null message would make the
            // failure row indistinguishable from a success
            case e: Exception => batch.map(_ => (null: String, e.toString))
          }
        batch.lazyZip(completions).map { case (row, (value, err)) =>
          Row.fromSeq(row.toSeq :+ value :+ err)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** SummaryEnricher with a pluggable client (metadata key "summary",
    * maxWordCount default 100 — SummaryEnricher.cs:36). With the
    * default [[ExtractiveClient]] this produces exactly
    * Processors.withSummary's column, through the client seam.
    */
  def withSummary(df: DataFrame, client: ChatClient = null,
                  textCol: String = "content", maxWords: Int = 100,
                  batchSize: Int = 16): DataFrame =
    enrich(df, if (client == null) ExtractiveClient(maxWords) else client,
      "summary", summaryPrompt(maxWords), textCol, batchSize)

  def withClassification(df: DataFrame, client: ChatClient, categories: Seq[String],
                         textCol: String = "content", batchSize: Int = 16): DataFrame =
    enrich(df, client, "classification",
      prompt("Classify this text into one of the following categories: " +
        s"[${categories.mkString(", ")}]. Return just the category."),
      textCol, batchSize)

  def withSentiment(df: DataFrame, client: ChatClient,
                    textCol: String = "content", batchSize: Int = 16): DataFrame =
    enrich(df, client, "sentiment",
      prompt("Decide the sentiment of this text: Positive, Negative or Neutral. " +
        "Return just the sentiment."),
      textCol, batchSize)
}
