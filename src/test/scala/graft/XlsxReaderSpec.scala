package graft

import graft.sources.XlsxElementReader
import graft.sources.XlsxElementReader._

/** XlsxElementReader — SpreadsheetML in, the SAME element stream the
  * other readers emit (the MarkItDownReader contract applied to the
  * spreadsheet leg: markitdown converts each sheet to a markdown
  * table; graft emits sheet-name header + pipe table element).
  * Covers the value-encoding matrix (shared/inline/formula strings,
  * numbers, booleans), sparse rows, merged ranges, multi-sheet order,
  * and the crawl robustness cases: corrupt zip, missing parts,
  * malformed XML, zip bombs.
  */
class XlsxReaderSpec extends SparkSpecBase {

  private def blocks(sheets: Seq[SSheet]) =
    XlsxElementReader.parseBlocks(synthesize(sheets))

  test("one sheet emits a header (sheet name) then one pipe table") {
    val got = blocks(Seq(SSheet("stats", Seq(
      Seq(SInline("field"), SInline("value")),
      Seq(SInline("rows"), SNum("42"))))))
    assert(got.map(b => (b._1, b._2, b._4)) == Seq(
      ("header", 1, "stats"),
      ("table", 0, "field value rows 42")))
    assert(got.head._3 == "# stats")
    assert(got(1)._3 ==
      "| field | value |\n| --- | --- |\n| rows | 42 |")
  }

  test("shared strings resolve by index; rich-text runs concatenate") {
    // two cells share one sst entry; synthesis interns first-use order
    val got = blocks(Seq(SSheet("s", Seq(
      Seq(SShared("alpha"), SShared("beta")),
      Seq(SShared("beta"), SShared("alpha"))))))
    assert(got(1)._4 == "alpha beta beta alpha")
  }

  test("value matrix: inline, shared, numeric, boolean render correctly") {
    val got = blocks(Seq(SSheet("m", Seq(
      Seq(SInline("in"), SShared("sh"), SNum("3.14"), SBool(true), SBool(false))))))
    assert(got(1)._4 == "in sh 3.14 TRUE FALSE")
  }

  test("sparse rows pad absent cells to keep column alignment") {
    val got = blocks(Seq(SSheet("sp", Seq(
      Seq(SInline("a"), SInline("b"), SInline("c")),
      Seq(SInline("x"), SEmpty, SInline("z"))))))
    // markdown keeps the empty pad; text joins non-empty cells only
    assert(got(1)._3.linesIterator.toSeq.last == "| x |  | z |")
    assert(got(1)._4 == "a b c x z")
  }

  test("merged ranges blank covered cells even when values were duplicated") {
    // producer duplicated the anchor value into the covered cell B1
    val got = blocks(Seq(SSheet("mg", Seq(
      Seq(SInline("title"), SInline("title")),
      Seq(SInline("l"), SInline("r"))),
      merges = Seq("A1:B1"))))
    assert(got(1)._3.linesIterator.next() == "| title |  |")
    assert(got(1)._4 == "title l r")
  }

  test("multi-sheet workbooks emit sheets in workbook order") {
    val got = blocks(Seq(
      SSheet("first", Seq(Seq(SInline("1")))),
      SSheet("second", Seq(Seq(SInline("2"))))))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "first"), ("table", "1"),
      ("header", "second"), ("table", "2")))
  }

  test("an empty sheet emits its header element only") {
    val got = blocks(Seq(
      SSheet("empty", Nil),
      SSheet("full", Seq(Seq(SInline("x"))))))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "empty"), ("header", "full"), ("table", "x")))
  }

  test("XML escapes in cell text roundtrip; whitespace collapses") {
    val got = blocks(Seq(SSheet("esc", Seq(
      Seq(SInline("a < b & c > d"), SInline("two\n lines\t here"))))))
    assert(got(1)._4 == "a < b & c > d two lines here")
  }

  test("corrupt zip, truncated bytes, and non-xlsx zips degrade to Nil") {
    assert(XlsxElementReader.parseBlocks(null) == Nil)
    assert(XlsxElementReader.parseBlocks(Array[Byte](1, 2, 3)) == Nil)
    val real = synthesize(Seq(SSheet("s", Seq(Seq(SInline("x"))))))
    assert(XlsxElementReader.parseBlocks(real.take(40)) == Nil)
    // a DOCX is a valid zip with no workbook part
    val docx = graft.sources.DocxElementReader.synthesize(
      Seq(graft.sources.DocxElementReader.SPara("p")))
    assert(XlsxElementReader.parseBlocks(docx) == Nil)
  }

  test("malformed worksheet XML degrades to the sheet header alone") {
    val good = synthesize(Seq(SSheet("ok", Seq(Seq(SInline("x"))))))
    // corrupt the worksheet part: rebuild the zip with broken XML
    val parts = Seq(
      "[Content_Types].xml" -> "<Types/>",
      "xl/workbook.xml" ->
        """<workbook xmlns:r="r"><sheets><sheet name="ok" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> "<worksheet><sheetData><row")
    val bytes = graft.sources.Ooxml.zipPackage(parts)
    val got = XlsxElementReader.parseBlocks(bytes)
    assert(got == Seq(("header", 1, "# ok", "ok")))
    assert(XlsxElementReader.parseBlocks(good).size == 2)
  }

  test("width cap: a hostile wide row cannot exceed MaxCols columns") {
    // one cell claims column XFD (index 16383); the rendered grid must
    // stay within MaxCols
    val parts = Seq(
      "[Content_Types].xml" -> "<Types/>",
      "xl/workbook.xml" ->
        """<workbook xmlns:r="r"><sheets><sheet name="w" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="XFD1" t="inlineStr"><is><t>far</t></is></c></row></sheetData></worksheet>""")
    val got = XlsxElementReader.parseBlocks(graft.sources.Ooxml.zipPackage(parts))
    val tableLine = got(1)._3.linesIterator.next()
    assert(tableLine.count(_ == '|') <= XlsxElementReader.MaxCols + 1)
    assert(got(1)._4 == "a") // the out-of-cap cell is dropped
  }

  test("colIndex decodes multi-letter references") {
    assert(XlsxElementReader.colIndex("A1").contains(0))
    assert(XlsxElementReader.colIndex("Z9").contains(25))
    assert(XlsxElementReader.colIndex("AA3").contains(26))
    assert(XlsxElementReader.colIndex("XFD1").contains(16383))
    assert(XlsxElementReader.colIndex("123").isEmpty)
  }

  test("elements(): distributed parse matches local parseBlocks") {
    import spark.implicits._
    val bytes = synthesize(Seq(SSheet("s", Seq(
      Seq(SInline("k"), SInline("v")), Seq(SInline("a"), SNum("1"))))))
    val df = Seq((7L, bytes)).toDF("doc_id", "content")
    val got = XlsxElementReader.elements(spark, df).collect().toSeq
      .sortBy(_.seq)
    assert(got.map(e => (e.doc_id, e.seq, e.kind, e.text)) == Seq(
      (7L, 0, "header", "s"), (7L, 1, "table", "k v a 1")))
  }
}
