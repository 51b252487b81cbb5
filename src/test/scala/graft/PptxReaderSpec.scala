package graft

import graft.sources.PptxElementReader
import graft.sources.PptxElementReader._

/** PptxElementReader — PresentationML in, the shared element stream
  * out, slide number as the page (the PDF-leg contract). Covers the
  * placeholder mapping (title → header, body → paragraphs, notes →
  * footers), tables, images, slide order, run formatting, and the
  * crawl robustness cases.
  */
class PptxReaderSpec extends SparkSpecBase {

  private def blocks(slides: Seq[PSlide]) =
    PptxElementReader.parseBlocks(synthesize(slides))

  test("title → header(1), body paras → paragraphs, slide number as page") {
    val got = blocks(Seq(PSlide(Seq(
      PTitle("Quarterly"), PBody(Seq("first point", "second point"))))))
    assert(got.map(b => (b._1, b._2, b._4, b._5)) == Seq(
      ("header", 1, "Quarterly", 1),
      ("paragraph", 0, "first point", 1),
      ("paragraph", 0, "second point", 1)))
    assert(got.head._3 == "# Quarterly")
  }

  test("slides emit in sldIdLst order with increasing page numbers") {
    val got = blocks(Seq(
      PSlide(Seq(PTitle("one"))),
      PSlide(Seq(PTitle("two"))),
      PSlide(Seq(PTitle("three")))))
    assert(got.map(b => (b._4, b._5)) == Seq(
      ("one", 1), ("two", 2), ("three", 3)))
  }

  test("a:tbl renders as the shared pipe-markdown table contract") {
    val got = blocks(Seq(PSlide(Seq(
      PTable(Seq(Seq("h1", "h2"), Seq("a", "b")))))))
    assert(got.map(b => (b._1, b._4)) == Seq(("table", "h1 h2 a b")))
    assert(got.head._3 == "| h1 | h2 |\n| --- | --- |\n| a | b |")
  }

  test("p:pic emits an image element with descr alt text") {
    val got = blocks(Seq(PSlide(Seq(PImage("chart of revenue")))))
    assert(got.map(b => (b._1, b._4)) == Seq(("image", "chart of revenue")))
    assert(got.head._3.startsWith("![chart of revenue]("))
  }

  test("notes emit as footer elements after the slide content") {
    val got = blocks(Seq(PSlide(
      Seq(PTitle("t"), PBody(Seq("p1"))),
      notes = Seq("remember the demo", "skip slide on time"))))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "t"), ("paragraph", "p1"),
      ("footer", "remember the demo"), ("footer", "skip slide on time")))
  }

  test("XML escapes roundtrip and whitespace collapses in all paths") {
    val got = blocks(Seq(PSlide(Seq(
      PTitle("a < b & c"), PBody(Seq("x\n  y\t z"))))))
    assert(got.map(_._4) == Seq("a < b & c", "x y z"))
  }

  test("corrupt zip, truncated bytes, and non-pptx zips degrade to Nil") {
    assert(PptxElementReader.parseBlocks(null) == Nil)
    assert(PptxElementReader.parseBlocks(Array[Byte](80, 75, 9, 9)) == Nil)
    val real = synthesize(Seq(PSlide(Seq(PTitle("x")))))
    assert(PptxElementReader.parseBlocks(real.take(40)) == Nil)
    val docx = graft.sources.DocxElementReader.synthesize(
      Seq(graft.sources.DocxElementReader.SPara("p")))
    assert(PptxElementReader.parseBlocks(docx) == Nil)
  }

  test("a missing slide part contributes nothing; later slides still parse") {
    // hand-build a deck referencing slide1 (absent) and slide2 (present)
    val slide2 =
      """<p:sld xmlns:p="p" xmlns:a="a"><p:cSld><p:spTree>""" +
        """<p:sp><p:nvSpPr><p:cNvPr id="2" name="s"/><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>""" +
        """<p:txBody><a:p><a:r><a:t>survivor</a:t></a:r></a:p></p:txBody></p:sp>""" +
        """</p:spTree></p:cSld></p:sld>"""
    val bytes = graft.sources.Ooxml.zipPackage(Seq(
      "[Content_Types].xml" -> "<Types/>",
      "ppt/presentation.xml" ->
        """<p:presentation xmlns:p="p" xmlns:r="r"><p:sldIdLst><p:sldId id="256" r:id="rId1"/><p:sldId id="257" r:id="rId2"/></p:sldIdLst></p:presentation>""",
      "ppt/_rels/presentation.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Type="t" Target="slides/slide1.xml"/><Relationship Id="rId2" Type="t" Target="slides/slide2.xml"/></Relationships>""",
      "ppt/slides/slide2.xml" -> slide2))
    val got = PptxElementReader.parseBlocks(bytes)
    assert(got.map(b => (b._1, b._4, b._5)) == Seq(("header", "survivor", 2)))
  }

  test("sldNum/dt placeholders are skipped; ftr placeholder maps to footer") {
    val deck =
      """<p:sld xmlns:p="p" xmlns:a="a"><p:cSld><p:spTree>""" +
        """<p:sp><p:nvSpPr><p:cNvPr id="2" name="n"/><p:nvPr><p:ph type="sldNum"/></p:nvPr></p:nvSpPr><p:txBody><a:p><a:r><a:t>7</a:t></a:r></a:p></p:txBody></p:sp>""" +
        """<p:sp><p:nvSpPr><p:cNvPr id="3" name="f"/><p:nvPr><p:ph type="ftr"/></p:nvPr></p:nvSpPr><p:txBody><a:p><a:r><a:t>conf 2026</a:t></a:r></a:p></p:txBody></p:sp>""" +
        """</p:spTree></p:cSld></p:sld>"""
    val bytes = graft.sources.Ooxml.zipPackage(Seq(
      "[Content_Types].xml" -> "<Types/>",
      "ppt/presentation.xml" ->
        """<p:presentation xmlns:p="p" xmlns:r="r"><p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst></p:presentation>""",
      "ppt/_rels/presentation.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Type="t" Target="slides/slide1.xml"/></Relationships>""",
      "ppt/slides/slide1.xml" -> deck))
    val got = PptxElementReader.parseBlocks(bytes)
    assert(got.map(b => (b._1, b._4)) == Seq(("footer", "conf 2026")))
  }

  test("bold/italic run properties render as markdown; text stays plain") {
    val deck =
      """<p:sld xmlns:p="p" xmlns:a="a"><p:cSld><p:spTree>""" +
        """<p:sp><p:nvSpPr><p:cNvPr id="2" name="b"/><p:nvPr/></p:nvSpPr><p:txBody>""" +
        """<a:p><a:r><a:rPr b="1"/><a:t>bold</a:t></a:r><a:r><a:t> and </a:t></a:r><a:r><a:rPr i="1"/><a:t>ital</a:t></a:r></a:p>""" +
        """</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"""
    val bytes = graft.sources.Ooxml.zipPackage(Seq(
      "[Content_Types].xml" -> "<Types/>",
      "ppt/presentation.xml" ->
        """<p:presentation xmlns:p="p" xmlns:r="r"><p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst></p:presentation>""",
      "ppt/_rels/presentation.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Type="t" Target="slides/slide1.xml"/></Relationships>""",
      "ppt/slides/slide1.xml" -> deck))
    val got = PptxElementReader.parseBlocks(bytes)
    assert(got.size == 1)
    assert(got.head._3 == "**bold** and *ital*")
    assert(got.head._4 == "bold and ital")
  }

  test("elements(): distributed parse carries slide as page_number") {
    import spark.implicits._
    val bytes = synthesize(Seq(
      PSlide(Seq(PTitle("s1"))), PSlide(Seq(PBody(Seq("p2"))))))
    val df = Seq((3L, bytes)).toDF("doc_id", "content")
    val got = PptxElementReader.elements(spark, df).collect().toSeq.sortBy(_.seq)
    assert(got.map(e => (e.doc_id, e.seq, e.kind, e.text, e.page_number)) == Seq(
      (3L, 0, "header", "s1", Some(1)), (3L, 1, "paragraph", "p2", Some(2))))
  }
}
