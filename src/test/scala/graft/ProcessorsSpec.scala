package graft

import graft.operators.{Processors, TextAnalysis}
import org.apache.spark.sql.functions._

class ProcessorsSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "content")

  test("withSummary: first-N-token extractive summary") {
    val got = Processors.withSummary(docs(1L -> "a b c d e f"), textCol = "content", maxWords = 3)
      .select("summary").as[String].head()
    assert(got == "a b c")
  }

  test("ClientEnricher: client seam matches the column-expression enricher, keeps all columns") {
    import graft.operators.ClientEnricher
    val in = docs(1L -> "a b c d e f", 2L -> "x y")
    val viaClient = ClientEnricher.withSummary(in, maxWords = 3)
    assert(viaClient.columns.toSeq ==
      Seq("doc_id", "content", "summary", "summary_error"))
    val got = viaClient.orderBy("doc_id")
      .select("summary", "summary_error").as[(String, String)].collect()
    val expected = Processors.withSummary(in, maxWords = 3)
      .orderBy("doc_id").select("summary").as[String].collect()
    assert(got.map(_._1).toSeq == expected.toSeq)
    assert(got.forall(_._2 == null), "no error rows expected")
  }

  test("ClientEnricher: failures land in the per-row error channel, not the job") {
    import graft.operators.ClientEnricher
    // fails any prompt whose BODY contains "poison"; returns null for
    // "empty" — both must surface as error rows among healthy ones
    val flaky = new ClientEnricher.ChatClient {
      def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
        if (p.contains("poison")) throw new IllegalStateException("model refused")
        else if (p.contains("empty")) null
        else "ok:" + p.linesIterator.drop(1).mkString(" ")
      }
    }
    val in = docs(1L -> "fine text", 2L -> "poison pill", 3L -> "empty reply", 4L -> "also fine")
    // batchSize = 1 isolates the thrown batch to its own row
    val got = ClientEnricher.enrich(in, flaky, "summary",
        ClientEnricher.summaryPrompt(100), batchSize = 1)
      .orderBy("doc_id")
      .select("doc_id", "summary", "summary_error")
      .as[(Long, String, String)].collect()
    assert(got(0) == ((1L, "ok:fine text", null)))
    assert(got(1)._2 == null && got(1)._3.contains("model refused"))
    assert(got(2)._2 == null && got(2)._3.contains("null completion"))
    assert(got(3) == ((4L, "ok:also fine", null)))
    // a thrown batch fails every row IN that batch only (coalesce(1):
    // batches form per partition, so all 4 rows must share one)
    val batched = ClientEnricher.enrich(in.coalesce(1), flaky, "summary",
        ClientEnricher.summaryPrompt(100), batchSize = 4)
      .select("summary_error").as[String].collect()
    assert(batched.forall(e => e != null && e.contains("model refused")))
  }

  test("withKeywords: vocabulary terms ranked by tf, ties alphabetical") {
    val got = Processors.withKeywords(
      docs(1L -> "spark spark data join join join missing"),
      vocabulary = Seq("join", "spark", "data", "stream"),
      textCol = "content", maxKeywords = 2)
      .select("keywords").as[Seq[String]].head()
    assert(got == Seq("join", "spark"))
  }

  test("withClassification: max-hits class, Unknown fallback") {
    val classes = Map("a" -> Seq("alpha"), "b" -> Seq("beta"))
    val got = Processors.withClassification(
      docs(1L -> "alpha alpha beta", 2L -> "beta", 3L -> "gamma"),
      classes, textCol = "content")
      .orderBy("doc_id").select("classification").as[String].collect()
    assert(got.toSeq == Seq("a", "b", "Unknown"))
  }

  test("withSentiment: polarity and Unknown") {
    val got = Processors.withSentiment(
      docs(1L -> "good good bad", 2L -> "bad", 3L -> "meh", 4L -> "good bad"),
      textCol = "content")
      .orderBy("doc_id").select("sentiment").as[String].collect()
    assert(got.toSeq == Seq("Positive", "Negative", "Unknown", "Neutral"))
  }

  test("removeFooters / removeEmpty on elements") {
    val elems = Seq(
      (1L, 0, "footer", "page 1"), (1L, 1, "paragraph", "keep"), (1L, 2, "paragraph", "  ")
    ).toDF("doc_id", "seq", "kind", "text")
    val got = Processors.removeEmpty(Processors.removeFooters(elems))
      .select("text").as[String].collect()
    assert(got.toSeq == Seq("keep"))
  }

  test("withImageAltText fills empty image alt from markdown url") {
    val elems = Seq(
      (1L, "image", "![](http://u/pic.png)", ""), (2L, "image", "![has alt](u)", "has alt")
    ).toDF("doc_id", "kind", "markdown", "text")
    val got = Processors.withImageAltText(elems).orderBy("doc_id").select("text").as[String].collect()
    assert(got(0) == "image:http://u/pic.png")
    assert(got(1) == "has alt")
  }

  test("langId picks the stopword-dominant language") {
    val got = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der Hund und die Katze ist nicht da"),
      (3L, "xyzzy qwerty")
    ).toDF("doc_id", "text")
      .select(TextAnalysis.langId(col("text")).as("l")).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
  }

  test("cleanText strips urls/emails and normalizes whitespace") {
    val got = Seq((1L, "see https://x.io/page and  mail a@b.com \n ok")).toDF("doc_id", "text")
      .select(TextAnalysis.cleanText(col("text"))).as[String].head()
    assert(got == "see and mail ok")
  }

  test("lineStats counts total vs distinct non-empty lines") {
    val got = Seq((1L, "a\nb\na\n\n  \na")).toDF("doc_id", "text")
      .select(TextAnalysis.lineStats(col("text")).as("ls"))
      .select("ls.n_lines", "ls.n_distinct_lines").as[(Int, Int)].head()
    assert(got == ((4, 2)))
  }

  test("enrichmentsToMetadata folds enricher columns into the metadata map") {
    val enriched = Processors.withSentiment(
      Processors.withKeywords(docs(1L -> "fast spark data"),
        vocabulary = Seq("spark", "data"), textCol = "content"),
      textCol = "content")
    val got = Processors.enrichmentsToMetadata(enriched)
      .select("metadata").as[Map[String, String]].head()
    assert(got == Map("keywords" -> "data,spark", "sentiment" -> "Positive"))
  }

  test("enrichmentsToMetadata overwrites colliding keys (reference Metadata[key] = value)") {
    val enriched = Processors.withSentiment(docs(1L -> "fast work"), textCol = "content")
      .withColumn("metadata", map(lit("sentiment"), lit("stale"), lit("src"), lit("a.pdf")))
    // bare map_concat would THROW on the duplicate 'sentiment' key;
    // the merge must be last-wins and keep unrelated keys
    val got = Processors.enrichmentsToMetadata(enriched, keys = Seq("sentiment"))
      .select("metadata").as[Map[String, String]].head()
    assert(got == Map("src" -> "a.pdf", "sentiment" -> "Positive"))
  }

  test("piiRedact replaces emails, phones and IPv4s; counts match") {
    val text = "mail bob.smith+x@sub.example.co or 555-123-4567 / 555.987.6543 " +
      "from 10.0.3.25 version 1.2 not-a-phone 12-34-5678"
    val got = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextAnalysis.piiCounts(col("text")).as("pc"),
        TextAnalysis.piiRedact(col("text")).as("r"))
      .select("pc.n_emails", "pc.n_phones", "pc.n_ips", "r")
      .as[(Int, Int, Int, String)].head()
    assert(got._1 == 1 && got._2 == 2 && got._3 == 1)
    assert(got._4 == "mail <EMAIL> or <PHONE> / <PHONE> from <IP> " +
      "version 1.2 not-a-phone 12-34-5678")
  }

  test("corpusFilter: signals, first-failing reason, keep flag") {
    val longDoc = (1 to 40).map(i => s"word$i").mkString(" ")
    val got = TextAnalysis.corpusFilter(Seq(
      (1L, longDoc),                       // ok
      (2L, "too few tokens"),              // too_short
      (3L, (1 to 30).map(_ => "pneumonoultramicroscopics").mkString(" ")) // tokens_too_long
    ).toDF("doc_id", "text"))
      .orderBy("doc_id").select("reason", "keep").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("ok", 1), ("too_short", 0), ("tokens_too_long", 0)))
  }

  test("zipfFit: exact power-law corpus gives slope -1, r2 1; topV truncates ranks") {
    // counts 24/12/8/6 = 24/r for ranks 1..4 → ln(c) = ln24 - ln(r)
    val text = (Seq.fill(24)("aa") ++ Seq.fill(12)("bb") ++
      Seq.fill(8)("cc") ++ Seq.fill(6)("dd")).mkString(" ")
    val fit = TextAnalysis.zipfFit(Seq((1L, "en", text)).toDF("doc_id", "lang", "text"))
      .select("v", "slope", "intercept", "r2").as[(Long, Double, Double, Double)].head()
    assert(fit._1 == 4L)
    assert(math.abs(fit._2 - (-1.0)) < 1e-9, s"slope ${fit._2}")
    assert(math.abs(fit._3 - math.log(24.0)) < 1e-9, s"intercept ${fit._3}")
    assert(math.abs(fit._4 - 1.0) < 1e-9, s"r2 ${fit._4}")
    // topV bounds the fit to the head ranks
    val head3 = TextAnalysis.zipfFit(Seq((1L, "en", text)).toDF("doc_id", "lang", "text"), topV = 3)
      .select("v").as[Long].head()
    assert(head3 == 3L)
    // groups with fewer than 3 types are dropped, not emitted as NaN
    assert(TextAnalysis.zipfFit(
      Seq((1L, "xx", "one two one")).toDF("doc_id", "lang", "text")).count() == 0)
  }

  test("gopherRules: every rule fires on its construction, in the paper's order") {
    val ok = ("the cat and that dog have fun with nice toys here " * 6).trim // 66 words, stopwords present
    val bullets = (1 to 10).map(_ => "- alpha beta gamma delta epsilon").mkString("\n") // 60 words, all lines bulleted
    val ellipsis = Seq(
      "the cat and that dog have fun with toys...",
      "more plain words here about the garden today...",
      "the dog and the cat with all that stuff...",
      "plain line about nothing much at all today",
      "another plain line with the usual words here",
      "more of the same words that fill this out") // 3/6 lines end in '...', 3 symbols / 59 words
      .mkString("\n")
    val numeric = ((1 to 50).map(_ => "word") ++ (1 to 15).map(_ => "12345")).mkString(" ")
    val got = TextAnalysis.gopherRules(Seq(
      (1L, ok),
      (2L, "just a few words"),                                   // too_few_words
      (3L, (1 to 60).map(_ => "ab").mkString(" ")),               // word_len_low (mean 2)
      (4L, (1 to 60).map(_ => "extraordinarily").mkString(" ")),  // word_len_high (mean 15)
      (5L, ((1 to 60).map(_ => "word") ++ (1 to 10).map(_ => "#")).mkString(" ")), // symbol_ratio 10/70
      (6L, bullets),                                              // bullet_lines
      (7L, ellipsis),                                             // ellipsis_lines
      (8L, numeric),                                              // non_alpha_words 50/65
      (9L, (1 to 60).map(i => s"word$i").mkString(" "))           // few_stopwords
    ).toDF("doc_id", "text"))
      .orderBy("doc_id").select("reason", "keep").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("ok", 1), ("too_few_words", 0), ("word_len_low", 0),
      ("word_len_high", 0), ("symbol_ratio", 0), ("bullet_lines", 0),
      ("ellipsis_lines", 0), ("non_alpha_words", 0), ("few_stopwords", 0)))
    // fraction signals are exact rationals of the constructed counts
    val row = TextAnalysis.gopherRules(Seq((7L, ellipsis)).toDF("doc_id", "text"))
      .select("ellipsis_frac", "symbol_ratio", "n_words").as[(Double, Double, Int)].head()
    assert(row._1 == 3.0 / 6.0 && row._2 == 3.0 / row._3)
  }

  test("unigramScore: exact frequencies, OOV counting, rarest-token signal") {
    val reference = Seq(
      (10L, "spark spark spark data query"),
      (11L, "data table")
    ).toDF("doc_id", "text") // counts: spark=3, data=2, query=1, table=1
    val scored = TextAnalysis.unigramScore(Seq(
      (1L, "spark data"),        // freq_sum 3+2, min 2
      (2L, "query zebra spark")  // zebra is OOV → min_freq 0
    ).toDF("doc_id", "text"), reference)
      .orderBy("doc_id")
      .select("n_tokens", "n_oov", "freq_sum", "min_freq")
      .as[(Long, Long, Long, Long)].collect()
    assert(scored(0) == ((2L, 0L, 5L, 2L)))
    assert(scored(1) == ((3L, 1L, 4L, 0L)))
  }

  test("bigramScore: bigram hits, OOV count, Katz-backoff mass; <2-token docs dropped") {
    val reference = Seq(
      (10L, "the quick fox the quick dog"),
      (11L, "quick fox")
    ).toDF("doc_id", "text")
    // reference bigrams: (the,quick)=2 (quick,fox)=2 (fox,the)=1 (quick,dog)=1
    // reference unigrams: the=2 quick=3 fox=2 dog=1
    val scored = TextAnalysis.bigramScore(Seq(
      (1L, "the quick fox"),   // both bigrams seen: bg_freq 2+2
      (2L, "lazy quick fox"),  // (lazy,quick) OOV → backoff on 'quick'=3
      (3L, "one")              // no bigram → no row
    ).toDF("doc_id", "text"), reference)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "n_bg_oov", "bg_freq_sum", "backoff_freq_sum")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(scored.toSeq == Seq(
      (1L, 2L, 0L, 4L, 0L),
      (2L, 2L, 1L, 2L, 3L)))
  }

  test("dsirWeights: target-like bigrams score above raw-only; <2-token docs dropped") {
    val docs = Seq(
      (1L, "a b a b", "t"),  // 3 bigram features, all target-seen
      (2L, "c d", "r"),      // raw-only bigram
      (3L, "a b", "r"),      // target-seen bigram from a raw doc
      (4L, "x", "r")         // 1 token → no feature, no row
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirWeights(docs, isTarget = col("lang") === "t")
      .orderBy("doc_id")
      .select("doc_id", "n_feat", "log_weight")
      .as[(Long, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 3L), (2L, 1L), (3L, 1L)))
    val w = got.map(t => t._1 -> t._3).toMap
    // same feature multiset as doc 1's prefix → target-tilted docs win
    assert(w(3L) > w(2L))
    // hand-computed: target counts (a b)=2 (b a)=1, raw adds doc3's
    // (a b) and doc2's (c d) → tTot=3 rTot=5; add-one over B=4096
    def term(tc: Long, rc: Long) =
      math.log((tc + 1.0) / (3 + 4096).toDouble) - math.log((rc + 1.0) / (5 + 4096).toDouble)
    assert(math.abs(w(3L) - term(2, 3)) < 1e-5)
    assert(math.abs(w(2L) - term(0, 1)) < 1e-5)
    assert(math.abs(w(1L) - (2 * term(2, 3) + term(1, 1))) < 1e-5)
  }

  test("qualityBuckets: rank-exact terciles of the OOV-ppm score, head = reference-like") {
    val reference = Seq((10L, "alpha beta gamma")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta"),        // 0 OOV → score 0
      (2L, "alpha zzz"),         // 1/2 OOV → 500000
      (3L, "yyy zzz"),           // 2/2 OOV → 1000000
      (4L, "alpha beta gamma")   // 0 OOV → 0
    ).toDF("doc_id", "text")
    // n=4: t1 = min score with cum*3 >= 4  → cum(0)=2 ≥ 2 → t1=0
    //      t2 = min score with cum*3 >= 8  → cum(500000)=3 → t2=500000
    val got = TextAnalysis.qualityBuckets(docs, reference)
      .orderBy("doc_id").select("doc_id", "score", "bucket")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, "head"), (2L, 500000L, "middle"),
      (3L, 1000000L, "tail"), (4L, 0L, "head")))
  }

  test("vocabStats: tokens/types/hapaxes/TTR per group, empty group zeroed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b b c", "s1"),   // s1: tokens 7, types {a,b,c,d}, hapax {c,d}? — see below
      (2L, "a b d", "s1"),
      (3L, "", "s2"),          // tokenless group
      (4L, "x x x", "s3")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.vocabStats(docs, "source").orderBy("source").collect()
    val s1 = got(0)
    // s1 corpus counts: a=2, b=3, c=1, d=1 → 7 tokens, 4 types, 2 hapaxes
    assert(s1.getAs[Long]("n_docs") == 2L && s1.getAs[Long]("n_tokens") == 7L)
    assert(s1.getAs[Long]("n_types") == 4L && s1.getAs[Long]("n_hapax") == 2L)
    assert(math.abs(s1.getAs[Double]("ttr") - 0.571429) < 1e-9)
    val s2 = got(1)
    assert(s2.getAs[Long]("n_docs") == 1L && s2.getAs[Long]("n_tokens") == 0L
      && s2.getAs[Double]("ttr") == 0.0)
    val s3 = got(2)
    assert(s3.getAs[Long]("n_types") == 1L && s3.getAs[Long]("n_hapax") == 0L)
  }

  test("qualityScore components") {
    val goodText = (1 to 30).map(_ => "the words and more of it").mkString(" ")
    val got = Seq((1L, goodText), (2L, "!!! ??? ***"), (3L, "")).toDF("doc_id", "text")
      .select(TextAnalysis.qualityScore(col("text")).as("q")).as[Int].collect()
    assert(got(0) == 100) // mid-length + low punct + stopword-rich
    assert(got(1) < 40)
    assert(got(2) == 0)
  }
}
