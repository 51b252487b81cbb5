package graft

import graft.model.Chunk
import graft.operators.{Chunkers, ChunkerOptions}
import org.apache.spark.sql.functions._

/** Chunker semantics, mirroring the reference's chunker tests
  * (test/.../DocumentTokenChunkerTests.cs, HeaderChunkerTests.cs,
  * MarkdownChunkerTests.cs, SemanticSimilarityChunkerTests.cs).
  */
class ChunkersSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ------------------------------------------------------------- token
  test("tokenChunks: windows with overlap cover all tokens") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Chunkers.tokenChunks(docs(1L -> text), ChunkerOptions(maxTokens = 40, overlap = 10))
      .orderBy("chunk_id").collect()
    // step = 30 → starts at 0, 30, 60, 90 → 4 chunks
    assert(out.length == 4)
    val first = out(0).getAs[String]("content").split(" ")
    assert(first.head == "w1" && first.length == 40)
    val second = out(1).getAs[String]("content").split(" ")
    assert(second.head == "w31") // overlap of 10
    val last = out(3).getAs[String]("content").split(" ")
    assert(last.head == "w91" && last.last == "w100" && last.length == 10)
    assert(out.forall(r => r.getAs[Int]("token_count") == r.getAs[String]("content").split(" ").length))
  }

  test("tokenChunks: carryCols copy page and metadata onto every chunk") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val paged = docs(1L -> text)
      .withColumn("page_number", lit(4))
      .withColumn("metadata", map(lit("lang"), lit("en")))
    val out = Chunkers.tokenChunks(paged, ChunkerOptions(maxTokens = 40, overlap = 10),
      carryCols = Seq("page_number", "metadata")).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Int]("page_number") == 4))
    assert(out.forall(_.getAs[Map[String, String]]("metadata") == Map("lang" -> "en")))
  }

  test("pluggable tokenCounter shifts chunk boundaries (reference Tokenizer hook)") {
    // 40 words with punctuation: whitespace counts 1 token per word;
    // the BPE-ish counter counts word-run + dot = 2 — the same text
    // must produce MORE chunks under the subword counter
    val text = (1 to 40).map(i => s"word$i.").mkString(" ")
    val ws = Chunkers.headerChunks(spark, docs(1L -> text),
      ChunkerOptions(maxTokens = 20, overlap = 0)).collect()
    val bpe = Chunkers.headerChunks(spark, docs(1L -> text),
      ChunkerOptions(maxTokens = 20, overlap = 0,
        tokenCounter = ChunkerOptions.RegexBpeCounter)).collect()
    assert(ChunkerOptions.RegexBpeCounter("word1.") == 2) // "word1" run + "."
    assert(bpe.length > ws.length)
    // token_count is reported in the configured counter's units
    assert(bpe.forall(_.token_count <= 20))
  }

  test("tokenChunks: exact overlap windows (reference OverlapTokenChunkerTests)") {
    // OverlapTokenChunkerTests.TokenChunking_WithOverlap: size 4,
    // overlap 1 over 9 words → the reference's exact three windows
    val out = Chunkers.tokenChunks(docs(1L -> "The quick brown fox jumps over the lazy dog"),
      ChunkerOptions(maxTokens = 4, overlap = 1)).orderBy("chunk_id")
      .select("content").as[String].collect().toSeq
    assert(out == Seq("The quick brown fox", "fox jumps over the", "the lazy dog"))
  }

  test("tokenChunks: no-overlap chunks reconstruct the document (reference NoOverlapTokenChunkerTests)") {
    val text = Seq.fill(600)("word").mkString(" ")
    val out = Chunkers.tokenChunks(docs(1L -> text), ChunkerOptions(maxTokens = 512, overlap = 0))
      .orderBy("chunk_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Int]("token_count") <= 512))
    assert(out.map(_.getAs[String]("content")).mkString(" ") == text)
  }

  test("headerChunks: long paragraph under a 3-header stack splits at the reference boundary") {
    // HeaderChunkerTests.CanSplitLongerParagraphsOnNewLine: budget 30
    // splits the long paragraph after "...new line." and pulls the
    // following paragraph into the second chunk, context on both
    val md = "# Header A\n## Header B\n### Header C\n\n" +
      "This is a very long text. It's expressed with plenty of tokens. And it contains a new line.\n" +
      "With some text after the new line.\n\nAnd following paragraph."
    val out = Chunkers.headerChunks(spark, docs(1L -> md),
      ChunkerOptions(maxTokens = 30, overlap = 0)).collect().sortBy(_.chunk_id)
    assert(out.length == 2)
    assert(out.forall(_.context == "# Header A ## Header B ### Header C"))
    assert(out(0).content.contains("contains a new line.") &&
      !out(0).content.contains("With some text"))
    assert(out(1).content.contains("With some text after the new line.") &&
      out(1).content.contains("And following paragraph."))
    assert(out.forall(_.token_count <= 30))
  }

  test("tokenChunks: short doc yields one chunk; empty doc none") {
    val out = Chunkers.tokenChunks(docs(1L -> "a b c", 2L -> "  "),
      ChunkerOptions(maxTokens = 40, overlap = 10)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("content") == "a b c")
  }

  test("oversized context under a subword counter truncates honestly, no crash") {
    // one giant whitespace-token context ("a.b.c...." — zero spaces):
    // the whitespace cut can't shrink it, so the char-halving fallback
    // must (a) not throw on the empty-offsets path and (b) keep the
    // reported token_count within budget under the CONFIGURED counter
    val ctx = (1 to 50).map(i => s"w$i").mkString(".")
    val out = Chunkers.packElements(1L, ctx, Seq(("paragraph", "body text")),
      ChunkerOptions(maxTokens = 10, overlap = 0,
        tokenCounter = ChunkerOptions.RegexBpeCounter), startId = 0)
    assert(out.nonEmpty)
    assert(out.forall(c => ChunkerOptions.RegexBpeCounter(c.context) < 10))
    assert(out.forall(_.token_count <= 10))
  }

  test("elementChunks: chunks inherit page_number and metadata per page run") {
    import graft.model.DocElement
    val elems = Seq(
      DocElement(1L, 0, "paragraph", 0, "page one text", "page one text",
        Some(1), Map("src" -> "a.pdf")),
      DocElement(1L, 1, "paragraph", 0, "still page one", "still page one",
        Some(1), Map("src" -> "a.pdf")),
      DocElement(1L, 0, "paragraph", 0, "page two text", "page two text",
        Some(2), Map("src" -> "a.pdf"))
    ).toDS()
    val out = Chunkers.elementChunks(spark, elems, ChunkerOptions(maxTokens = 50, overlap = 0))
      .collect().sortBy(_.chunk_id)
    assert(out.length == 2) // one chunk per page run
    assert(out(0).page_number.contains(1) && out(0).content.contains("still page one"))
    assert(out(1).page_number.contains(2))
    assert(out.forall(_.metadata == Map("src" -> "a.pdf")))
  }

  // ----------------------------------------------------------- elements
  test("ChunkerOptions validates like the reference IngestionChunkerOptions") {
    // ChunkerOptionsTests: non-positive budget and overlap >= budget
    // are constructor-time errors, not silent misbehavior
    intercept[IllegalArgumentException](ChunkerOptions(maxTokens = 0))
    intercept[IllegalArgumentException](ChunkerOptions(maxTokens = -5))
    intercept[IllegalArgumentException](ChunkerOptions(maxTokens = 10, overlap = -1))
    intercept[IllegalArgumentException](ChunkerOptions(maxTokens = 10, overlap = 10))
    intercept[IllegalArgumentException](ChunkerOptions(maxTokens = 1000, overlap = 1500))
    ChunkerOptions(maxTokens = 10, overlap = 9) // boundary is legal
    // TokenizerIsRequired: a null counter is a constructor-time error
    intercept[IllegalArgumentException](ChunkerOptions(tokenCounter = null))
  }

  test("ChunkerOptions: default overlap adapts to a small budget (reference DefaultOverlap*)") {
    // ChunkerOptionsTests.DefaultValues / DefaultOverlapTokensIsZero
    // ForSmallMaxTokensPerChunk: untouched options carry 2000/500; a
    // small explicit budget silently zeroes the DEFAULT overlap
    // instead of failing the 500 >= 100 validation
    val defaults = ChunkerOptions()
    assert(defaults.maxTokens == 2000 && defaults.overlapTokens == 500)
    assert(ChunkerOptions(maxTokens = 100).overlapTokens == 0)
    assert(ChunkerOptions(maxTokens = 500).overlapTokens == 0)  // 500 !< 500
    assert(ChunkerOptions(maxTokens = 501).overlapTokens == 500)
    // ...but an EXPLICIT overlap is validated strictly, never adapted
    intercept[IllegalArgumentException](ChunkerOptions(maxTokens = 100, overlap = 500))
    // the adaptive default drives real chunking: budget 100, no overlap
    val chunks = Chunkers.tokenChunks(
      Seq((1L, (1 to 250).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
      ChunkerOptions(maxTokens = 100))
      .orderBy("chunk_id").select("content").as[String].collect()
    assert(chunks.length == 3) // 100 + 100 + 50, disjoint
    assert(chunks.map(_.split(" ").length).toSeq == Seq(100, 100, 50))
  }

  test("packElements: respects token budget and context prefix") {
    val elems = Seq(("paragraph", "one two three"), ("paragraph", "four five"), ("paragraph", "six"))
    val chunks = Chunkers.packElements(7L, "CTX", elems, ChunkerOptions(maxTokens = 5, overlap = 0), 0)
    // budget = 5 - 1(ctx) = 4: [one two three] | [four five six]
    assert(chunks.map(_.chunk_id) == Seq(0, 1))
    assert(chunks.forall(_.content.startsWith("CTX\n")))
    assert(chunks.forall(_.token_count <= 5))
    assert(chunks(0).content == "CTX\none two three")
    assert(chunks(1).content == "CTX\nfour five\nsix")
  }

  test("packElements: oversized paragraph splits by sentence, repacks greedily") {
    val big = "First sentence here. Second sentence too. Third one closes."
    val chunks = Chunkers.packElements(1L, "", Seq(("paragraph", big)),
      ChunkerOptions(maxTokens = 6, overlap = 0), 0)
    // 3-token sentences packed two-per-chunk under the 6-token budget
    assert(chunks.map(_.content) ==
      Seq("First sentence here.\nSecond sentence too.", "Third one closes."))
    assert(chunks.forall(_.token_count <= 6))
  }

  test("packElements: oversized table splits by row, repeating header") {
    val table = "| h1 | h2 |\n|---|---|\n| a | b |\n| c | d |\n| e | f |"
    val rows = table.split("\n")
    val chunks = Chunkers.packElements(1L, "", Seq(("table", table)),
      ChunkerOptions(maxTokens = 14, overlap = 0), 0)
    assert(chunks.length > 1)
    // every chunk repeats the header + separator rows
    assert(chunks.forall(_.content.startsWith(rows(0) + "\n" + rows(1))))
    // every data row appears exactly once across chunks
    val dataRows = rows.drop(2)
    for (r <- dataRows)
      assert(chunks.count(_.content.contains(r)) == 1)
  }

  test("headerChunks: oversized table is row-split, not dropped (regression)") {
    val rows = (1 to 12).map(i => s"| r$i | v$i |").mkString("\n")
    val md = s"# T\n\n| h1 | h2 |\n|---|---|\n$rows"
    val out = Chunkers.headerChunks(spark, docs(1L -> md), ChunkerOptions(maxTokens = 20, overlap = 0))
      .collect().sortBy(_.chunk_id)
    assert(out.length > 1)
    for (i <- 1 to 12) // every data row survives exactly once
      assert(out.count(_.content.contains(s"| r$i |")) == 1, s"row r$i lost")
    assert(out.forall(_.content.contains("| h1 | h2 |"))) // header repeated
  }

  // ------------------------------------------------------------- header
  test("headerChunks: header-path context, headers never in content") {
    val md = "# A\n\npara one\n\n## B\n\npara two\n\n# C\n\npara three"
    val out = Chunkers.headerChunks(spark, docs(1L -> md), ChunkerOptions(maxTokens = 50, overlap = 0))
      .collect().sortBy(_.chunk_id)
    assert(out.map(_.context).toSeq == Seq("# A", "# A ## B", "# C"))
    assert(out.map(_.content).toSeq ==
      Seq("# A\npara one", "# A ## B\npara two", "# C\npara three"))
  }

  test("headerChunks: deeper levels cleared when a shallower header arrives") {
    val md = "# A\n\n## B\n\n### C\n\nx\n\n## D\n\ny"
    val out = Chunkers.headerChunks(spark, docs(1L -> md), ChunkerOptions(maxTokens = 50, overlap = 0))
      .collect().sortBy(_.chunk_id)
    assert(out.map(_.context).toSeq == Seq("# A ## B ### C", "# A ## D"))
  }

  // ------------------------------------------------------------ section
  test("headerChunks: nested header stack contexts match reference NestedSections") {
    // SectionChunkerTests.NestedSections, markdown-expressible part:
    // context is the space-joined header chain; content = context +
    // newline-joined paragraphs of that (sub)section
    val md = "# Section title\n\nThis is a paragraph in section 1.\n\nThis is another paragraph in section 1.\n\n" +
      "## Subsection title\n\nThis is a paragraph in subsection 1.1.\n\nThis is another paragraph in subsection 1.1.\n\n" +
      "### Subsubsection title\n\nThis is a paragraph in subsubsection 1.1.1.\n\nThis is another paragraph in subsubsection 1.1.1."
    val out = Chunkers.headerChunks(spark, docs(1L -> md)).collect().sortBy(_.chunk_id)
    assert(out.length == 3)
    assert(out(0).context == "# Section title")
    assert(out(0).content ==
      "# Section title\nThis is a paragraph in section 1.\nThis is another paragraph in section 1.")
    assert(out(1).context == "# Section title ## Subsection title")
    assert(out(2).context == "# Section title ## Subsection title ### Subsubsection title")
    assert(out(2).content.endsWith("This is another paragraph in subsubsection 1.1.1."))
  }

  test("sectionChunks: headerless and empty docs match reference One/EmptySection") {
    // SectionChunkerTests.OneSection: no header → empty context,
    // paragraphs newline-joined; EmptySection: no chunks at all
    val out = Chunkers.sectionChunks(spark,
      docs(1L -> "This is a paragraph.\n\nThis is another paragraph.", 2L -> "")).collect()
    assert(out.length == 1)
    assert(out.head.context == "" &&
      out.head.content == "This is a paragraph.\nThis is another paragraph.")
  }

  test("sectionChunks: h1 delimits sections, header is context") {
    val md = "intro\n\n# S1\n\nbody one\n\n# S2\n\nbody two"
    val out = Chunkers.sectionChunks(spark, docs(1L -> md), ChunkerOptions(maxTokens = 50, overlap = 0))
      .collect().sortBy(_.chunk_id)
    assert(out.map(_.context).toSeq == Seq("", "# S1", "# S2"))
    assert(out(0).content == "intro")
  }

  // ----------------------------------------------------------- markdown
  test("markdownChunks: reference ComplexDocument expectations (both split levels)") {
    val md = "# Header 1\n\nThis is the content under header 1.\n\n" +
      "## Header 2\n\nThis is the content under header 2.\n\n" +
      "### Header 3\n\nThis is the content under header 3.\n\n" +
      "## Header 4\n\nThis is the content under header 4."
    // MarkdownChunkerTests.ComplexDocument (default split level 3)
    val l3 = Chunkers.markdownChunks(spark, docs(1L -> md)).collect().sortBy(_.chunk_id)
    assert(l3.length == 4)
    assert(l3.map(_.context).toSeq == Seq(
      "# Header 1",
      "# Header 1;## Header 2",
      "# Header 1;## Header 2;### Header 3",
      "# Header 1;## Header 4")) // a level-2 header clears deeper levels
    assert(l3(0).content == "This is the content under header 1.")
    // MarkdownChunkerTests.ComplexDocument_SplitOnLowerLevel (split 2):
    // the level-3 header stays INSIDE the content of its level-2 chunk
    val l2 = Chunkers.markdownChunks(spark, docs(1L -> md), headerLevelToSplitOn = 2)
      .collect().sortBy(_.chunk_id)
    assert(l2.length == 3)
    assert(l2(1).context == "# Header 1;## Header 2")
    assert(l2(1).content ==
      "This is the content under header 2.\n### Header 3\nThis is the content under header 3.")
    assert(l2(2).context == "# Header 1;## Header 4")
  }

  test("markdownChunks: split at level<=N, chained context") {
    val md = "# A\n\np1\n\n## B\n\np2\n\n#### Deep\n\np3"
    val out = Chunkers.markdownChunks(spark, docs(1L -> md), headerLevelToSplitOn = 3)
      .collect().sortBy(_.chunk_id)
    // h4 does NOT split: p2 + "#### Deep" + p3 stay together
    assert(out.length == 2)
    assert(out(0).context == "# A" && out(0).content == "p1")
    assert(out(1).context == "# A;## B")
    assert(out(1).content.contains("p2") && out(1).content.contains("p3"))
  }

  // ----------------------------------------------------------- semantic
  test("semanticChunks: repeated-vocab runs split where vocab shifts") {
    // two homogeneous runs with an abrupt vocabulary change
    val a = (1 to 6).map(_ => "alpha beta gamma delta").mkString("\n\n")
    val md = a + "\n\nzebra yak xylophone walrus vulture unicorn"
    val out = Chunkers.semanticChunks(spark, docs(1L -> md),
      ChunkerOptions(maxTokens = 100, overlap = 0), thresholdPercentile = 90.0)
      .collect().sortBy(_.chunk_id)
    assert(out.length == 2)
    assert(out(0).content.contains("alpha") && !out(0).content.contains("zebra"))
    assert(out(1).content.contains("zebra"))
  }

  test("sectionChunks: 600-word section splits into budget-respecting chunks that reconstruct (reference SizeLimit_TwoChunks)") {
    val text = Seq.fill(600)("word").mkString(" ")
    val out = Chunkers.sectionChunks(spark, docs(1L -> text),
      ChunkerOptions(maxTokens = 512, overlap = 0)).collect().sortBy(_.chunk_id)
    assert(out.length == 2)
    assert(out.forall(_.token_count <= 512))
    // no context → contents are the raw windows; rejoining them
    // reconstructs the document exactly (no token lost or duplicated)
    assert(out.map(_.content).mkString(" ") == text)
  }

  test("markdownChunks: headerless document is one chunk with empty context (reference NoheaderDocument)") {
    val md = "This is a paragraph.\n\nThis is another paragraph."
    val out = Chunkers.markdownChunks(spark, docs(1L -> md)).collect()
    assert(out.length == 1)
    assert(out.head.context == "")
    assert(out.head.content == "This is a paragraph.\nThis is another paragraph.")
  }

  test("semanticChunks: mixed element kinds pack tables as markdown and images as alt text (reference TwoSeparateTopicsWithAllKindsOfElements)") {
    // a table rides into the chunk as its markdown (rows preserved for
    // the oversized-table splitter); an image contributes its ALT TEXT,
    // never the ![..](..) markdown (ElementsChunker.cs:55-66)
    val md = "intro paragraph about languages\n\n" +
      "| Language | Type |\n| --- | --- |\n| scala | functional |\n\n" +
      "![a diagram of the runtime](diagram.png)"
    val out = Chunkers.semanticChunks(spark, docs(1L -> md),
      ChunkerOptions(maxTokens = 200, overlap = 0), thresholdPercentile = 100.0)
      .collect()
    val all = out.map(_.content).mkString("\n")
    assert(all.contains("| scala | functional |"), "table markdown must survive packing")
    assert(all.contains("a diagram of the runtime"), "image alt text must be packed")
    assert(!all.contains("!["), "image markdown must not be packed")
  }

  test("percentile: linear interpolation matches reference semantics") {
    assert(Chunkers.percentile(Seq(1.0, 2.0, 3.0, 4.0), 50.0).contains(2.5))
    assert(Chunkers.percentile(Seq(1.0, 2.0, 3.0, 4.0), 100.0).contains(4.0))
    assert(Chunkers.percentile(Seq(5.0), 95.0).contains(5.0))
    assert(Chunkers.percentile(Nil, 95.0).isEmpty)
  }

  test("recursiveChunks: three cascade levels and bounded bundle overflow") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), // fits the budget → one whole-paragraph chunk
      // sentences of 3/3/4 tokens at budget 4: s2 STARTS at offset 3
      // (inside window 0) so bundle 0 overflows by exactly one
      // sentence — the documented bounded trade; s3 starts at 6 → b1
      (2L, "one two three. four five six. seven eight nine ten."),
      // no sentence boundary, 9 tokens → hard windows of 4/4/1
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      // paragraph break: each block bundles independently
      (4L, "p1 p2 p3\n\nq1 q2 q3")
    ).toDF("doc_id", "text")
    val got = Chunkers.recursiveChunks(docs, maxTokens = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got.filter(_._1 == 1L).map(_._3) == Seq("a b c"))
    assert(got.filter(_._1 == 2L).map(r => (r._3, r._4)) == Seq(
      ("one two three. four five six.", 6L), // ≤ budget + one sentence
      ("seven eight nine ten.", 4L)))
    assert(got.filter(_._1 == 3L).map(r => (r._3, r._4)) == Seq(
      ("w1 w2 w3 w4", 4L), ("w5 w6 w7 w8", 4L), ("w9", 1L)))
    assert(got.filter(_._1 == 4L).map(_._3) == Seq("p1 p2 p3", "q1 q2 q3"))
    // chunk ids are 0-based and dense per document
    assert(got.groupBy(_._1).forall { case (_, cs) =>
      cs.map(_._2).sorted == (0L until cs.length).toSeq })
  }

  test("recursiveChunks: token-sequence preservation and bounded chunks on fuzzed docs") {
    import spark.implicits._
    val B = 6
    val rnd = new scala.util.Random(42)
    def doc(): String = {
      val n = 1 + rnd.nextInt(120)
      (1 to n).map { _ =>
        val w = ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5))
        rnd.nextInt(10) match {
          case 0 => w + ".\n\n"
          case 1 => w + "."
          case 2 => w + "!"
          case 3 => w + "?  "
          case _ => w
        }
      }.mkString(" ")
    }
    val docs = (1 to 40).map(i => (i.toLong, doc())).toDF("doc_id", "text")
    val chunks = Chunkers.recursiveChunks(docs, maxTokens = B)
      .orderBy("doc_id", "chunk_id").collect()
    def toks(s: String): Seq[String] = s.split("\\s+").filter(_.nonEmpty).toSeq
    // lossless: concatenating a document's chunks in order reproduces
    // its exact token sequence — nothing dropped, duplicated, reordered
    val got = chunks.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.sortBy(_.getLong(1)).flatMap(r => toks(r.getString(2))).toSeq }
    for ((id, want) <- docs.collect().map(r => r.getLong(0) -> toks(r.getString(1))))
      assert(got.getOrElse(id, Nil) == want, s"doc $id lost/reordered tokens")
    // budget: a bundle holds sentences STARTING inside one B-window,
    // so the worst chunk is B-1 occupied + one B-token sentence
    assert(chunks.forall(_.getLong(3) <= 2L * B - 1),
      chunks.filter(_.getLong(3) > 2L * B - 1).mkString("; "))
  }
}
