package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Structured-streaming pipeline e2e (file source → chunk/enrich/embed
  * → parquet sink with AvailableNow) and the stateful windowed
  * aggregation shape.
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("file-source stream → chunks → vector records, exactly-once by checkpoint") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    Files.writeString(java.nio.file.Path.of(in, "batch1.json"),
      """{"doc_id":1,"text":"# H\n\ngood text here","lang":"en","source":"t"}
        |{"doc_id":2,"text":"plain bad words","lang":"en","source":"t"}""".stripMargin)

    val chunks = StreamingIngest.chunkStream(spark, in)
    assert(chunks.isStreaming)
    StreamingIngest.writer(chunks, out, ckpt).start().awaitTermination()
    val got1 = spark.read.parquet(out)
    assert(got1.count() >= 2)
    assert(got1.columns.contains("embedding"))

    // second batch: only the new file is processed (checkpoint offsets)
    Files.writeString(java.nio.file.Path.of(in, "batch2.json"),
      """{"doc_id":3,"text":"third doc appears","lang":"en","source":"t"}""")
    StreamingIngest.writer(StreamingIngest.chunkStream(spark, in), out, ckpt)
      .start().awaitTermination()
    val got2 = spark.read.parquet(out)
    assert(got2.where(col("documentid") === "3").count() > 0)
    // doc 1's records not duplicated by the second trigger
    assert(got2.where(col("documentid") === "1").count() ==
      got1.where(col("documentid") === "1").count())
  }

  test("incrementalWriter: re-ingested documents replace their records") {
    val in = Files.createTempDirectory("graft-inc-in").toString
    val out = Files.createTempDirectory("graft-inc-out").toString
    val ckpt = Files.createTempDirectory("graft-inc-ckpt").toString
    Files.writeString(java.nio.file.Path.of(in, "b1.json"),
      """{"doc_id":1,"text":"version one text","lang":"en","source":"t"}""")
    StreamingIngest.incrementalWriter(
      StreamingIngest.chunkStream(spark, in), out, ckpt).start().awaitTermination()
    Files.writeString(java.nio.file.Path.of(in, "b2.json"),
      """{"doc_id":1,"text":"version two replaces","lang":"en","source":"t"}""")
    StreamingIngest.incrementalWriter(
      StreamingIngest.chunkStream(spark, in), out, ckpt).start().awaitTermination()
    val contents = spark.read.parquet(out)
      .where(col("documentid") === "1").select("content").as[String].collect()
    assert(contents.forall(_.contains("version two")), contents.mkString("; "))
  }

  test("eventWindowCounts: tumbling windows aggregate correctly (batch-mode check)") {
    val events = Seq(
      (Timestamp.valueOf("2024-01-01 10:01:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:04:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 10:11:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 10:01:30"), "view", 8.0)
    ).toDF("ts", "event_type", "value")
    // the same plan runs on a stream; batch mode lets us assert results
    val got = StreamingIngest.eventWindowCounts(events)
      .orderBy("window_start", "event_type").collect()
    assert(got.length == 3)
    val clicks1 = got(0)
    assert(clicks1.getAs[String]("event_type") == "click")
    assert(clicks1.getAs[Long]("n_events") == 2L)
    assert(clicks1.getAs[java.math.BigDecimal]("sum_value").doubleValue() == 3.0)
  }
}
