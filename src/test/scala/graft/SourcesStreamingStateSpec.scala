package graft

import graft.sources.{DocumentSource, MarkdownElementReader}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import java.sql.Timestamp

class SourcesStreamingStateSpec extends SparkSpecBase {
  import spark.implicits._

  test("DocumentSource.readDir: one document per matching file, stable ids") {
    val dir = Files.createTempDirectory("graft-docs")
    Files.writeString(dir.resolve("a.md"), "# A\n\nalpha body")
    Files.writeString(dir.resolve("b.md"), "# B\n\nbeta body")
    Files.writeString(dir.resolve("ignore.txt"), "not markdown")
    val docs = DocumentSource.readDir(spark, dir.toString)
    val rows = docs.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 2)
    assert(rows.forall(_.getAs[String]("source").endsWith(".md")))
    // parses straight into the element reader
    val elems = MarkdownElementReader.elements(spark, docs).collect()
    assert(elems.count(_.kind == "header") == 2)
    // id stability across re-reads (incremental ingestion contract)
    val again = DocumentSource.readDir(spark, dir.toString).collect()
    assert(again.map(_.getAs[Long]("doc_id")).sorted.sameElements(
      rows.map(_.getAs[Long]("doc_id")).sorted))
  }

  test("DocumentSource.readJsonl: text + id mapping, extra fields ride along") {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("corpus.jsonl"),
      """{"id": 7, "body": "alpha document", "lang": "en"}
        |{"id": 9, "body": "beta document", "lang": "de"}""".stripMargin)
    val docs = DocumentSource.readJsonl(spark, dir.toString,
      textField = "body", idField = Some("id"))
    val rows = docs.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(7L, 9L))
    assert(rows.head.getAs[String]("text") == "alpha document")
    assert(rows.map(_.getAs[String]("lang")).toSeq == Seq("en", "de"))
    // no id field: stable hash of text
    val hashed = DocumentSource.readJsonl(spark, dir.toString, textField = "body")
    assert(hashed.select("doc_id").distinct().count() == 2)
    assert(hashed.collect().map(_.getAs[Long]("doc_id")).sorted.sameElements(
      DocumentSource.readJsonl(spark, dir.toString, textField = "body")
        .collect().map(_.getAs[Long]("doc_id")).sorted))
  }

  test("sessionizeStream: gap closes sessions; watermark times out idle users") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val events = input.toDF().toDF("user_id", "ts")
    val sessions = StreamingIngest.sessionizeStream(spark, events, gapSeconds = 1800)
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions").outputMode("append").start()
    // base offset keeps events above the initial watermark (epoch 0),
    // which would otherwise drop a t=0 event as late data
    val B = 1000000L
    def ts(sec: Long) = new Timestamp((B + sec) * 1000)
    try {
      input.addData((1L, ts(0)), (1L, ts(100)), (2L, ts(50)))
      query.processAllAvailable()
      input.addData((1L, ts(5000))) // gap 4900 > 1800: closes session [0,100]
      query.processAllAvailable()
      input.addData((1L, ts(20000))) // closes [5000,5000]; watermark passes u2's timeout
      query.processAllAvailable()
      val got = spark.table("graft_sessions")
        .as[StreamingIngest.ClosedSession].collect()
        .map(s => (s.user_id, s.start_sec - B, s.end_sec - B, s.n_events)).toSet
      assert(got.contains((1L, 0L, 100L, 2L)), s"gap-closed session missing: $got")
      assert(got.contains((1L, 5000L, 5000L, 1L)), s"second session missing: $got")
      assert(got.contains((2L, 50L, 50L, 1L)), s"timed-out session missing: $got")
    } finally query.stop()
  }

  test("streamStreamJoin: purchases join clicks within the interval, state bounded by watermark") {
    val clicks = MemoryStream[(Long, Timestamp, String)](spark)
    val purchases = MemoryStream[(Long, Timestamp, String)](spark)
    val B = 1000000L
    def ts(sec: Long) = new Timestamp((B + sec) * 1000)
    val joined = StreamingIngest.streamStreamJoin(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      purchases.toDF().toDF("user_id", "ts", "purchase_id"),
      key = "user_id", within = "1 hour")
    assert(joined.isStreaming)
    val query = joined.writeStream
      .format("memory").queryName("graft_ssj").outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), "c1"), (2L, ts(0), "c2"))
      purchases.addData(
        (1L, ts(1800), "p_in"),    // 30 min after c1 → joins
        (1L, ts(7200), "p_late"),  // 2 h after c1 → outside interval
        (3L, ts(100), "p_nokey"))  // no matching click
      query.processAllAvailable()
      val got = spark.table("graft_ssj")
        .select("click_id", "r_purchase_id").as[(String, String)].collect().toSet
      assert(got == Set(("c1", "p_in")), s"unexpected join result: $got")
    } finally query.stop()
  }

  test("sessionizeStream: a late event > gap BEFORE the open session stays separate") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val events = input.toDF().toDF("user_id", "ts")
    // watermarkDelay (30 min) far exceeds the gap (100 s), so a
    // within-watermark late event can precede the open session by > gap
    val sessions = StreamingIngest.sessionizeStream(spark, events, gapSeconds = 100)
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions_late").outputMode("append").start()
    val B = 1000000L
    def ts(sec: Long) = new Timestamp((B + sec) * 1000)
    try {
      input.addData((1L, ts(5000)))
      query.processAllAvailable()
      input.addData((1L, ts(4000))) // 1000s BEFORE the open session's start
      query.processAllAvailable()
      input.addData((1L, ts(50000))) // closes the [5000,5000] session
      query.processAllAvailable()
      val got = spark.table("graft_sessions_late")
        .as[StreamingIngest.ClosedSession].collect()
        .map(s => (s.user_id, s.start_sec - B, s.end_sec - B, s.n_events)).toSet
      assert(got.contains((1L, 4000L, 4000L, 1L)), s"late event must be its own session: $got")
      assert(got.contains((1L, 5000L, 5000L, 1L)), s"open session must not absorb it: $got")
    } finally query.stop()
  }

  test("driftMonitor: closed windows score PSI against the static baseline") {
    val sink = Files.createTempDirectory("graft-drift-out").toString
    val ckpt = Files.createTempDirectory("graft-drift-ckpt").toString
    val baseline = (Seq.fill(50)("en") ++ Seq.fill(50)("de")).toDF("lang")
    val input = MemoryStream[(Timestamp, String)](spark)
    val stream = input.toDF().toDF("ts", "lang")
    val B = 1000000L
    def ts(sec: Long) = new Timestamp((B + sec) * 1000)
    val query = StreamingIngest.driftMonitor(stream, baseline, "lang",
      sink, ckpt, windowLen = "10 minutes", watermark = "0 seconds").start()
    try {
      // window [B, B+600): all-zh traffic — maximal drift vs en/de
      input.addData((ts(10), "zh"), (ts(20), "zh"), (ts(30), "zh"))
      query.processAllAvailable()
      // two flush batches: first advances the watermark past the
      // window end, second triggers the append-mode emission
      input.addData((ts(5000), "en"))
      query.processAllAvailable()
      input.addData((ts(9000), "en"))
      query.processAllAvailable()
      // the all-zh window closed (and no-data micro-batches may close
      // later flush windows too) — assert on the zh window's row
      val got = spark.read.parquet(sink).where(col("t_new") === 3L).collect()
      assert(got.length == 1, s"expected the zh window row, got ${got.toSeq}")
      // union-of-values bins: en + de (baseline) + zh (stream-only)
      assert(got(0).getAs[Long]("n_bins") == 3L)
      assert(got(0).getAs[Long]("t_new") == 3L)
      // complete distribution shift → PSI far above the 0.25 alarm bar
      assert(got(0).getAs[Double]("psi") > 0.25, got(0).toString)
    } finally query.stop()
  }
}
