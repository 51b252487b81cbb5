package graft

import graft.sources.DocxElementReader
import graft.sources.DocxElementReader._

/** DocxElementReader — OOXML in, the SAME element stream the markdown
  * and HTML readers emit (the MarkItDownReader contract applied to its
  * second-most-common input format). Structure expectations are ported
  * from the reference's MarkdownReader behaviors (header levels, image
  * alt text as element text, pipe tables, list-item leaves) applied to
  * the WordprocessingML equivalents, plus the robustness cases a crawl
  * needs: corrupt zips, truncated parts, malformed XML, zip bombs, XXE.
  */
class DocxReaderSpec extends SparkSpecBase {
  import spark.implicits._

  private def blocks(bs: Seq[SynthBlock]) =
    DocxElementReader.parseBlocks(synthesize(bs))

  test("headings map pStyle Heading1-6 to header levels; Title is level 1") {
    val got = blocks(Seq(
      SHeading(1, "Top"), SHeading(2, "Sub"), SHeading(6, "Deep"),
      SPara("body")))
    assert(got.map(b => (b._1, b._2, b._4)) == Seq(
      ("header", 1, "Top"), ("header", 2, "Sub"), ("header", 6, "Deep"),
      ("paragraph", 0, "body")))
    assert(got.head._3 == "# Top")
    assert(got(2)._3 == "###### Deep")
  }

  test("bold/italic runs render as markdown, text stays plain") {
    val got = blocks(Seq(SPara(Seq(
      SRun("plain "), SRun("bold", bold = true), SRun(" and "),
      SRun("ital", italic = true), SRun(" end")))))
    assert(got.size == 1)
    assert(got.head._3 == "plain **bold** and *ital* end")
    assert(got.head._4 == "plain bold and ital end")
  }

  test("hyperlinks resolve through the rels part to [text](url)") {
    val got = blocks(Seq(SPara(Seq(
      SRun("see "), SRun("the docs", link = Some("https://example.com/d")),
      SRun(" here")))))
    assert(got.head._3 == "see [the docs](https://example.com/d) here")
    assert(got.head._4 == "see the docs here")
  }

  test("standalone image paragraph becomes an image element with alt text") {
    val got = blocks(Seq(SImage("figure one"), SPara("after")))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("image", "figure one"), ("paragraph", "after")))
    assert(got.head._3.startsWith("![figure one](media/image1.png"))
  }

  test("numbered list items emit one paragraph element each") {
    val got = blocks(Seq(SList(Seq("first", "second", "third"))))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("paragraph", "first"), ("paragraph", "second"), ("paragraph", "third")))
  }

  test("table renders pipe markdown with separator; text joins cells") {
    val got = blocks(Seq(STable(Seq(
      Seq("h1", "h2"), Seq("a", "b"), Seq("c", "d")))))
    assert(got.size == 1)
    assert(got.head._1 == "table")
    assert(got.head._3 ==
      "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c | d |")
    assert(got.head._4 == "h1 h2 a b c d")
  }

  test("Footer style paragraphs emit as footer kind; Code as fenced code") {
    val got = blocks(Seq(
      SPara("body"), SCode("let x = 1"), SFooterPara("page footer")))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("paragraph", "body"), ("code", "let x = 1"), ("footer", "page footer")))
    assert(got(1)._3 == "```\nlet x = 1\n```")
  }

  test("XML special characters round-trip exactly") {
    val tricky = "a & b < c > d \"quoted\" 'apos' é中"
    val got = blocks(Seq(SPara(tricky)))
    assert(got.head._4 == tricky)
  }

  test("whitespace collapses per block (like the HTML reader)") {
    val got = blocks(Seq(SPara("  spaced\t\tout\n text  ")))
    assert(got.head._4 == "spaced out text")
  }

  test("corrupt inputs degrade to empty, never throw") {
    assert(DocxElementReader.parseBlocks(null).isEmpty)
    assert(DocxElementReader.parseBlocks(Array.empty[Byte]).isEmpty)
    assert(DocxElementReader.parseBlocks("not a zip".getBytes).isEmpty)
    // valid zip, no word/document.xml
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    assert(DocxElementReader.parseBlocks(bos.toByteArray).isEmpty)
    // valid zip, malformed XML in document.xml
    val bos2 = new java.io.ByteArrayOutputStream
    val z2 = new java.util.zip.ZipOutputStream(bos2)
    z2.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z2.write("<w:document><unclosed".getBytes); z2.closeEntry(); z2.close()
    assert(DocxElementReader.parseBlocks(bos2.toByteArray).isEmpty)
    // truncated real docx: drop the last half of the bytes
    val real = synthesize(Seq(SPara("hello")))
    assert(DocxElementReader.parseBlocks(real.take(real.length / 2)) != null)
  }

  test("zip bomb part is dropped (decompression cap), parse degrades") {
    // 200 MB of zeros compresses to ~200 KB; the cap must refuse to
    // inflate it rather than OOM the executor
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    val zeros = new Array[Byte](1 << 20)
    for (_ <- 0 until 200) z.write(zeros)
    z.closeEntry(); z.close()
    assert(bos.size() < (2 << 20), "setup: bomb should compress small")
    assert(DocxElementReader.parseBlocks(bos.toByteArray).isEmpty)
  }

  test("styles.xml indirection: custom pStyle ids resolve to headings") {
    // real Word exports rarely put the literal built-in id on the
    // paragraph: the pStyle points at a custom style whose w:name is
    // the built-in ("heading 1") or that is basedOn a heading style
    val doc =
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        """<w:p><w:pPr><w:pStyle w:val="MyHead"/></w:pPr><w:r><w:t>By Name</w:t></w:r></w:p>""" +
        """<w:p><w:pPr><w:pStyle w:val="Derived"/></w:pPr><w:r><w:t>By Chain</w:t></w:r></w:p>""" +
        """<w:p><w:pPr><w:pStyle w:val="Looped"/></w:pPr><w:r><w:t>Cycle Safe</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t>plain body</w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    val styles =
      """<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        """<w:style w:type="paragraph" w:styleId="MyHead"><w:name w:val="heading 1"/></w:style>""" +
        """<w:style w:type="paragraph" w:styleId="Derived"><w:name w:val="Fancy"/><w:basedOn w:val="Mid"/></w:style>""" +
        """<w:style w:type="paragraph" w:styleId="Mid"><w:name w:val="Middle"/><w:basedOn w:val="Heading2"/></w:style>""" +
        """<w:style w:type="paragraph" w:styleId="Looped"><w:name w:val="L1"/><w:basedOn w:val="Looped"/></w:style>""" +
        """</w:styles>"""
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    def put(n: String, c: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(c.getBytes); z.closeEntry()
    }
    put("word/document.xml", doc)
    put("word/styles.xml", styles)
    z.close()
    val got = DocxElementReader.parseBlocks(bos.toByteArray)
      .map(b => (b._1, b._2, b._4))
    assert(got == Seq(
      ("header", 1, "By Name"),      // styles.xml name "heading 1"
      ("header", 2, "By Chain"),     // basedOn → Mid → Heading2
      ("paragraph", 0, "Cycle Safe"), // self-referential basedOn: no hang
      ("paragraph", 0, "plain body")), got.toString)
  }

  test("merged cells: gridSpan pads columns, vMerge continuation is empty") {
    // the two merge mechanisms real Word tables use: a header cell
    // spanning both columns (w:gridSpan=2) and a vertically merged
    // first column (w:vMerge restart + continue) — column alignment
    // must hold and the merged text must appear exactly once
    def tc(body: String, pr: String = ""): String =
      s"<w:tc>${if (pr.nonEmpty) s"<w:tcPr>$pr</w:tcPr>" else ""}" +
        s"<w:p><w:r><w:t>$body</w:t></w:r></w:p></w:tc>"
    val doc =
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body><w:tbl>""" +
        "<w:tr>" + tc("wide header", """<w:gridSpan w:val="2"/>""") + "</w:tr>" +
        "<w:tr>" + tc("tall", """<w:vMerge w:val="restart"/>""") + tc("r1") + "</w:tr>" +
        "<w:tr>" + tc("", "<w:vMerge/>") + tc("r2") + "</w:tr>" +
        "</w:tbl></w:body></w:document>"
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(doc.getBytes); z.closeEntry(); z.close()
    val got = DocxElementReader.parseBlocks(bos.toByteArray)
    assert(got.map(_._1) == Seq("table"), got.toString)
    assert(got.head._3 ==
      "| wide header |  |\n| --- | --- |\n| tall | r1 |\n|  | r2 |",
      got.head._3)
    assert(got.head._4 == "wide header tall r1 r2", got.head._4)
  }

  test("a table nested inside a cell flattens to text, never lost") {
    def tc(inner: String): String = s"<w:tc>$inner</w:tc>"
    def p(t: String): String = s"<w:p><w:r><w:t>$t</w:t></w:r></w:p>"
    val innerTbl = "<w:tbl><w:tr>" + tc(p("in1")) + tc(p("in2")) +
      "</w:tr></w:tbl>"
    val doc =
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body><w:tbl>""" +
        "<w:tr>" + tc(p("h1")) + tc(p("h2")) + "</w:tr>" +
        "<w:tr>" + tc(p("outer") + innerTbl) + tc(p("plain")) + "</w:tr>" +
        "</w:tbl></w:body></w:document>"
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(doc.getBytes); z.closeEntry(); z.close()
    val got = DocxElementReader.parseBlocks(bos.toByteArray)
    assert(got.map(_._1) == Seq("table"), got.toString)
    assert(got.head._3 ==
      "| h1 | h2 |\n| --- | --- |\n| outer in1 in2 | plain |",
      got.head._3)
    assert(got.head._4 == "h1 h2 outer in1 in2 plain", got.head._4)
  }

  test("over-deep XML spike keeps post-spike siblings in the body") {
    // r8 advice: past MaxDepth an element is appended but not pushed;
    // its END_ELEMENT must be swallowed, not pop a real ancestor —
    // with the old unconditional pop, a 300-deep spike popped body and
    // document off the stack and every later paragraph re-parented
    // outside <w:body>, silently dropping the rest of the document
    val spike = "<x>" * 300 + "</x>" * 300
    val xml =
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        """<w:p><w:r><w:t>before</w:t></w:r></w:p>""" + spike +
        """<w:p><w:r><w:t>after</w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(xml.getBytes); z.closeEntry(); z.close()
    val got = DocxElementReader.parseBlocks(bos.toByteArray)
    assert(got.map(_._4) == Seq("before", "after"), got.toString)
  }

  test("XXE: DOCTYPE with external entity is rejected, not fetched") {
    val evil =
      """<?xml version="1.0"?><!DOCTYPE doc [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        """<w:body><w:p><w:r><w:t>&xxe;</w:t></w:r></w:p></w:body></w:document>"""
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(evil.getBytes); z.closeEntry(); z.close()
    val got = DocxElementReader.parseBlocks(bos.toByteArray)
    assert(!got.exists(_._4.contains("root:")), s"XXE leaked: $got")
  }

  test("synthesis is deterministic; parse(synthesize) is a fixed point") {
    val spec = Seq(SHeading(1, "T"), SPara("body"), SImage("alt"),
      STable(Seq(Seq("a", "b"), Seq("1", "2"))), SFooterPara("f"))
    val b1 = synthesize(spec); val b2 = synthesize(spec)
    assert(java.util.Arrays.equals(b1, b2), "synthesize not byte-deterministic")
    assert(DocxElementReader.parseBlocks(b1) == DocxElementReader.parseBlocks(b2))
  }

  test("elements: pageCol and metaCols propagate; pipeline is reader-agnostic") {
    val docs = Seq(
      (1L, synthesize(Seq(SHeading(1, "A"), SPara("body text"))), 3, "web"),
      (2L, synthesize(Seq(SPara("only para"), SFooterPara("foot"))), 5, "crawl")
    ).toDF("doc_id", "content", "page", "src")
    val got = DocxElementReader.elements(spark, docs,
        pageCol = Some("page"), metaCols = Seq("src"))
      .collect().sortBy(e => (e.doc_id, e.seq))
    assert(got.map(e => (e.doc_id, e.seq, e.kind, e.text)).toSeq == Seq(
      (1L, 0, "header", "A"), (1L, 1, "paragraph", "body text"),
      (2L, 0, "paragraph", "only para"), (2L, 1, "footer", "foot")))
    assert(got.forall(e => e.page_number.isDefined && e.metadata.contains("src")))
    // the element stream feeds the SAME downstream ops as markdown/HTML
    val elems = DocxElementReader.elements(spark, docs,
      pageCol = Some("page"), metaCols = Seq("src")).toDF()
    val processed = graft.operators.Processors.removeEmpty(
      graft.operators.Processors.removeFooters(elems))
    assert(processed.count() == 3)
  }
}
