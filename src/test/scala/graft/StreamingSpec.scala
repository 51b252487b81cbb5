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

  test("StreamBatchParity: streaming sessionize/windows equal their batch answers on the events corpus") {
    import graft.streaming.StreamBatchParity
    // real corpus, real file-source micro-batches, watermark-flushed
    // results — must match the batch driver rows hash-exactly
    val batchSessions = SparkEntry.queries("q_sessionize")(spark, sf()).collect().toSeq
    val streamSessions = SparkEntry.queries("x_stream_sessionize")(spark, sf()).collect().toSeq
    assert(streamSessions.size == batchSessions.size,
      s"stream ${streamSessions.size} vs batch ${batchSessions.size} sessions")
    assert(streamSessions == batchSessions)
    val streamWins = SparkEntry.queries("x_stream_windows")(spark, sf())
      .select("hour_start", "event_type", "n_events").collect().toSeq
    val batchWins = SparkEntry.queries("q_event_windows")(spark, sf())
      .select("hour_start", "event_type", "n_events").collect().toSeq
    assert(streamWins == batchWins)
    // drift parity: one finalized row per event hour, a constant bin
    // set (= the corpus's event_type alphabet), PSI ≥ 0 (it is a
    // symmetrized-KL-style sum: every (p−q)·ln(p/q) term is ≥ 0)
    val drift = SparkEntry.queries("x_stream_drift")(spark, sf()).collect()
    val hours = batchWins.map(_.getLong(0)).distinct.size
    assert(drift.length == hours, s"${drift.length} psi rows vs $hours hours")
    assert(drift.map(_.getAs[Long]("n_bins")).distinct.length == 1)
    assert(drift.forall(_.getAs[Double]("psi") >= 0.0))
  }

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

  test("observedChunkStream: per-stage row counts arrive in streaming progress events") {
    val in = Files.createTempDirectory("graft-obs-in").toString
    Files.writeString(java.nio.file.Path.of(in, "b.json"),
      """{"doc_id":1,"text":"alpha beta gamma","lang":"en","source":"t"}
        |{"doc_id":2,"text":"delta epsilon","lang":"en","source":"t"}""".stripMargin)
    val q = StreamingIngest.observedChunkStream(spark, in)
      .writeStream.format("memory").queryName("graft_obs")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // per-stage counts ride the progress events — no extra jobs
    val metrics = q.recentProgress.flatMap(p =>
      scala.jdk.CollectionConverters.MapHasAsScala(p.observedMetrics).asScala)
      .groupMapReduce(_._1)((kv: (String, org.apache.spark.sql.Row)) =>
        kv._2.getAs[Long]("rows"))(_ + _)
    assert(metrics("graft_reader") == 2)
    assert(metrics("graft_chunker") == 2) // short docs → one chunk each
    assert(metrics("graft_chunkProcessor_0") == 2)
    assert(metrics("graft_chunkProcessor_1") == 2)
  }

  test("autoChunkStream: mixed md/html/docx/pdf directory → enriched chunks, stateless") {
    import graft.sources.{DocxElementReader, PdfElementReader}
    val in = Files.createTempDirectory("graft-auto-in").toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    Files.write(java.nio.file.Path.of(in, "a.md"),
      "# Doc A\n\nalpha body text".getBytes(utf8))
    Files.write(java.nio.file.Path.of(in, "b.html"),
      "<html><body><h1>Doc B</h1><p>beta body text</p></body></html>".getBytes(utf8))
    Files.write(java.nio.file.Path.of(in, "c.docx"),
      DocxElementReader.synthesize(Seq(
        DocxElementReader.SHeading(1, "Doc C"),
        DocxElementReader.SPara("gamma body text"))))
    Files.write(java.nio.file.Path.of(in, "d.pdf"),
      PdfElementReader.synthesize(Seq(Seq(
        PdfElementReader.SHeading(1, "Doc D"),
        PdfElementReader.SPara("delta body text")))))
    // a markdown doc that merely MENTIONS %PDF- in its first KB: the
    // tolerant sniff misroutes it to the PDF parser; the zero-element
    // fallback must keep its content and flag the recovery in chunk
    // metadata (r9 verdict item 1 — observable in the stream's rows)
    Files.write(java.nio.file.Path.of(in, "e.md"),
      "# Doc E\n\nepsilon body text mentions %PDF-1.7 early".getBytes(utf8))
    val q = StreamingIngest.autoChunkStream(spark, in)
      .writeStream.format("memory").queryName("graft_auto")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("graft_auto").collect()
    // all five documents landed, each as one enriched chunk
    assert(got.map(_.getAs[Long]("doc_id")).distinct.length == 5)
    assert(got.forall(r => r.getAs[String]("summary") != null &&
      r.getAs[String]("sentiment") != null))
    val contents = got.map(_.getAs[String]("content")).sorted.toSeq
    for (body <- Seq("alpha body text", "beta body text",
        "gamma body text", "delta body text", "epsilon body text"))
      assert(contents.exists(_.contains(body)), body)
    // the recovered doc's chunk carries the format_fallback flag
    val recovered = got.filter(
      _.getAs[String]("content").contains("epsilon body text"))
    assert(recovered.nonEmpty)
    assert(recovered.forall { r =>
      val m = r.getAs[Map[String, String]]("metadata")
      m.get("format").contains("markdown") &&
        m.get("format_fallback").contains("pdf")
    }, recovered.map(_.getAs[Map[String, String]]("metadata")).toSeq.toString)
    // per-stage rows ride the progress events
    val metrics = q.recentProgress.flatMap(p =>
      scala.jdk.CollectionConverters.MapHasAsScala(p.observedMetrics).asScala)
      .groupMapReduce(_._1)((kv: (String, org.apache.spark.sql.Row)) =>
        kv._2.getAs[Long]("rows"))(_ + _)
    assert(metrics("graft_reader") == 5)
    assert(metrics("graft_chunker") == 5)
    assert(metrics("graft_chunkProcessor_1") == 5)
    // stateless by construction: no state-store operators in progress
    assert(q.recentProgress.forall(_.stateOperators.isEmpty))
    // and the fused streaming chunker matches the batch reader+chunker
    // path row-for-row (shared packDocElements makes them identical by
    // construction — this locks the contract)
    val batch = graft.operators.Chunkers.elementChunks(spark,
      graft.sources.AutoElementReader.elements(spark,
        graft.sources.DocumentSource.readBinaryDir(spark, in),
        metaCols = Seq("source"))).toDF()
      .select("doc_id", "chunk_id", "content").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val streamed = got.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("chunk_id"), r.getAs[String]("content"))).toSet
    assert(streamed == batch)
  }

  test("autoChunkStream: unparseable binary is countable, never silently absent") {
    // a corrupt binary (zip that is not a DOCX) yields the 'unparsed'
    // marker element (empty text) and therefore NO chunks — the loss
    // shows up as the reader-vs-chunker observed-row delta, the
    // pipeline metric the r9 verdict asked to exist
    val in = Files.createTempDirectory("graft-auto-bad").toString
    Files.write(java.nio.file.Path.of(in, "good.md"),
      "# Good\n\nsurvives".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("junk.bin"))
    z.write(Array.fill[Byte](64)(0x03)); z.closeEntry(); z.close()
    Files.write(java.nio.file.Path.of(in, "bad.docx"), bos.toByteArray)
    val q = StreamingIngest.autoChunkStream(spark, in)
      .writeStream.format("memory").queryName("graft_auto_bad")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("graft_auto_bad").collect()
    assert(got.map(_.getAs[Long]("doc_id")).distinct.length == 1)
    assert(got.forall(_.getAs[String]("content").contains("survives")))
    val metrics = q.recentProgress.flatMap(p =>
      scala.jdk.CollectionConverters.MapHasAsScala(p.observedMetrics).asScala)
      .groupMapReduce(_._1)((kv: (String, org.apache.spark.sql.Row)) =>
        kv._2.getAs[Long]("rows"))(_ + _)
    assert(metrics("graft_reader") == 2) // both files entered
    assert(metrics("graft_chunker") == 1) // the delta IS the loss count
  }

  test("autoChunkStream: ruled PDF table text flows into the chunk stream") {
    import graft.sources.PdfElementReader
    val in = Files.createTempDirectory("graft-auto-tbl").toString
    Files.write(java.nio.file.Path.of(in, "t.pdf"),
      PdfElementReader.synthesize(Seq(Seq(
        PdfElementReader.SHeading(1, "Spec Sheet"),
        PdfElementReader.STable(Seq(
          Seq("part", "qty"), Seq("flange", "9"))),
        PdfElementReader.SPara("trailing note")))))
    val q = StreamingIngest.autoChunkStream(spark, in)
      .writeStream.format("memory").queryName("graft_auto_tbl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val contents = spark.table("graft_auto_tbl")
      .collect().map(_.getAs[String]("content")).toSeq
    // the grid the content stream drew arrives as a pipe-markdown
    // table in a chunk — the crawl-shaped e2e the grid detector implies
    assert(contents.exists(c =>
      c.contains("| part | qty |") && c.contains("| flange | 9 |")),
      contents.toString)
    assert(contents.exists(_.contains("trailing note")), contents.toString)
  }

  test("text-analysis ops compose with streams: PII scrub + corpus filter on a file stream") {
    val in = Files.createTempDirectory("graft-pii-in").toString
    val out = Files.createTempDirectory("graft-pii-out").toString
    val ckpt = Files.createTempDirectory("graft-pii-ckpt").toString
    val body = (1 to 30).map(i => s"token$i").mkString(" ")
    Files.writeString(java.nio.file.Path.of(in, "b1.json"),
      s"""{"doc_id":1,"text":"$body mail me at a@b.co","lang":"en","source":"t"}
         |{"doc_id":2,"text":"short doc","lang":"en","source":"t"}""".stripMargin)
    // the scrub + filter are pure column expressions, so the same
    // operators run unchanged on a streaming DataFrame (map-only: no
    // state store, no watermark, no stream-stream join)
    def stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING").json(in)
      .withColumn("text", graft.operators.TextAnalysis.piiRedact(col("text")))
    val verdicts = graft.operators.TextAnalysis.corpusFilter(stream)
    assert(verdicts.isStreaming)
    verdicts.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      .awaitTermination()
    val got = spark.read.parquet(out).orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Int]("keep") == 1)
    assert(got(1).getAs[String]("reason") == "too_short")
    val out2 = Files.createTempDirectory("graft-pii-out2").toString
    val ckpt2 = Files.createTempDirectory("graft-pii-ckpt2").toString
    stream.select(col("doc_id"), col("text")).writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      .awaitTermination()
    val red = spark.read.parquet(out2).orderBy("doc_id").collect()
    assert(red(0).getAs[String]("text").endsWith("mail me at <EMAIL>"))
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

  test("cdcStream: micro-batched changelog merges into the snapshot") {
    val in = Files.createTempDirectory("graft-cdc-in").toString
    val snap = Files.createTempDirectory("graft-cdc-snap").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(snap)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "seq BIGINT, op STRING, doc_id BIGINT, text STRING")
    def drain(): Unit = StreamingIngest.cdcStream(
      spark.readStream.schema(schema).json(in), snap, ckpt)
      .start().awaitTermination()
    // batch 1: update doc 1 twice (last wins), delete doc 2
    Files.writeString(java.nio.file.Path.of(in, "b1.json"),
      """{"seq":10,"op":"U","doc_id":1,"text":"one v1"}
        |{"seq":11,"op":"U","doc_id":1,"text":"one v2"}
        |{"seq":12,"op":"D","doc_id":2,"text":""}""".stripMargin)
    drain()
    // batch 2: insert doc 4, then a later update of doc 1 (cross-batch)
    Files.writeString(java.nio.file.Path.of(in, "b2.json"),
      """{"seq":20,"op":"I","doc_id":4,"text":"four"}
        |{"seq":21,"op":"U","doc_id":1,"text":"one v3"}""".stripMargin)
    drain()
    val got = spark.read.parquet(snap).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "one v3"), (3L, "three"), (4L, "four")), got.toString)
  }

  test("streamStaticEnrich: stream joins the static dimension map-side") {
    val in = Files.createTempDirectory("graft-enrich-in").toString
    val out = Files.createTempDirectory("graft-enrich-out").toString
    val ckpt = Files.createTempDirectory("graft-enrich-ckpt").toString
    Files.writeString(java.nio.file.Path.of(in, "b1.json"),
      """{"doc_id":1,"text":"alpha","lang":"en","source":"web"}
        |{"doc_id":2,"text":"beta","lang":"de","source":"pdf"}""".stripMargin)
    val dim = Seq(("web", 1), ("api", 2)).toDF("source", "tier")
    val stream = spark.readStream.schema(StreamingIngest.documentSchema).json(in)
    val enriched = StreamingIngest.streamStaticEnrich(stream, dim, "source")
    assert(enriched.isStreaming)
    enriched.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").start().awaitTermination()
    val got = spark.read.parquet(out)
      .select("doc_id", "tier").as[(Long, Option[Int])].collect().toMap
    assert(got == Map(1L -> Some(1), 2L -> None)) // left join keeps unmatched
  }

  test("dedupStream: re-delivered keys within the watermark are dropped") {
    val in = Files.createTempDirectory("graft-dedup-in").toString
    val out = Files.createTempDirectory("graft-dedup-out").toString
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    Files.writeString(java.nio.file.Path.of(in, "b1.json"),
      """{"doc_id":1,"text":"first delivery","ts":"2024-01-01T10:00:00.000Z"}
        |{"doc_id":1,"text":"duplicate delivery","ts":"2024-01-01T10:05:00.000Z"}
        |{"doc_id":2,"text":"other doc","ts":"2024-01-01T10:01:00.000Z"}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema).json(in)
    StreamingIngest.dedupStream(stream, Seq("doc_id"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").start().awaitTermination()
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
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
