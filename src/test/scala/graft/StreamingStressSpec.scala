package graft

import graft.streaming.StreamingIngest
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Throughput stress for the streaming ingestion path (VERDICT r5 #7):
  * the semantic specs prove the pipeline streams; this one proves it
  * SUSTAINS — N files × 5k documents processed in per-file
  * micro-batches, recording rows/s per stage from observedMetrics and
  * asserting steady progress with zero stream state (the ingestion
  * pipeline is stateless by design, so nothing may accumulate between
  * batches no matter how long the stream runs). The measured rates are
  * recorded in SURVEY §5.
  */
class StreamingStressSpec extends SparkSpecBase {

  test("4 x 5k-doc backlog: per-batch progress, per-stage rows/s, zero state") {
    val nFiles = 4
    val docsPerFile = 5000
    val in = Files.createTempDirectory("graft-stress-in").toString
    // ~40-token docs with per-doc variation (id-salted tokens) so the
    // quality filter keeps them and chunking does real work
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "the", "and", "of", "data", "stream", "window", "quality", "token")
    for (f <- 0 until nFiles) {
      val sb = new StringBuilder(1 << 22)
      for (i <- 0 until docsPerFile) {
        val id = f * docsPerFile + i
        val text = (0 until 40).map(t => words((id + t * 7) % words.size)).mkString(" ") +
          s" doc$id"
        sb.append(s"""{"doc_id":$id,"text":"$text","lang":"en","source":"stress"}\n""")
      }
      Files.writeString(java.nio.file.Path.of(in, s"backlog$f.json"), sb.toString)
    }

    val q = StreamingIngest.observedChunkStream(spark, in, maxFilesPerTrigger = 1)
      .writeStream.format("noop")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val progresses = q.recentProgress.filter(_.numInputRows > 0)
    assert(progresses.length == nFiles,
      s"expected $nFiles per-file micro-batches, got ${progresses.length}")

    // sustained progress: every micro-batch ingested its full file
    assert(progresses.forall(_.numInputRows == docsPerFile))

    // stateless by design: no state store rows may exist or grow
    for (p <- progresses; so <- p.stateOperators)
      assert(so.numRowsTotal == 0, s"unexpected stream state: $so")

    // per-stage rows and rows/s from the observe() taps
    val stageRows = progresses.flatMap(_.observedMetrics.asScala)
      .groupMapReduce(_._1)(_._2.getAs[Long]("rows"))(_ + _)
    val totalDocs = (nFiles * docsPerFile).toLong
    assert(stageRows("graft_reader") == totalDocs)
    assert(stageRows("graft_chunker") >= totalDocs) // >= 1 chunk per doc
    val wallSec = progresses.map(_.durationMs.get("triggerExecution").toLong).sum / 1000.0
    val perStage = stageRows.toSeq.sorted.map { case (s, n) =>
      f"$s=${n / wallSec}%.0f rows/s"
    }
    info(f"[stress] $totalDocs docs in $wallSec%.1fs; " + perStage.mkString("; "))
    // conservative floor — a stateless narrow pipeline on local[4]
    // does thousands of docs/s; anything under 200 means a stage
    // stopped fusing or the stream stopped batching
    assert(stageRows("graft_reader") / wallSec > 200,
      f"ingest rate collapsed: ${stageRows("graft_reader") / wallSec}%.0f docs/s")
  }
}
