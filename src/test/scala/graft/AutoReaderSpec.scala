package graft

import graft.sources.{AutoElementReader, DocxElementReader, PdfElementReader}

/** AutoElementReader — magic-byte routing over a mixed-format corpus:
  * detection, uniform element output across all four readers for the
  * same logical document, format metadata, and degrade behavior.
  */
class AutoReaderSpec extends SparkSpecBase {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("detect: magic bytes route pdf/docx/html/markdown") {
    assert(AutoElementReader.detect("%PDF-1.4\nx".getBytes(utf8)) == "pdf")
    assert(AutoElementReader.detect(
      Array[Byte]('P', 'K', 3, 4, 0, 0)) == "docx")
    assert(AutoElementReader.detect("<html><p>x</p>".getBytes(utf8)) == "html")
    assert(AutoElementReader.detect(
      "  \n\t <!DOCTYPE html><p>x".getBytes(utf8)) == "html")
    // UTF-8 BOM then tag
    assert(AutoElementReader.detect(
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, '<', 'p', '>')) == "html")
    assert(AutoElementReader.detect("# heading\ntext".getBytes(utf8)) == "markdown")
    assert(AutoElementReader.detect(Array.empty[Byte]) == "markdown")
    // 'PK' but not a local-file-header zip signature → not docx
    assert(AutoElementReader.detect("PKX rest".getBytes(utf8)) == "markdown")
  }

  test("all four formats emit the same canonical rows for one logical doc") {
    val title = "Doc 7"
    val body = "body: spark scans fast"
    val md = s"# $title\n\n$body".getBytes(utf8)
    val html = s"<html><body><h1>$title</h1><p>$body</p></body></html>".getBytes(utf8)
    val docx = DocxElementReader.synthesize(Seq(
      DocxElementReader.SHeading(1, title), DocxElementReader.SPara(body)))
    val pdf = PdfElementReader.synthesize(Seq(Seq(
      PdfElementReader.SHeading(1, title), PdfElementReader.SPara(body))))
    val expected = Seq(("header", 1, title), ("paragraph", 0, body))
    for ((bytes, fmt) <- Seq(md -> "markdown", html -> "html",
      docx -> "docx", pdf -> "pdf")) {
      assert(AutoElementReader.detect(bytes) == fmt, fmt)
      val got = AutoElementReader.parseBlocks(bytes).map(b => (b._1, b._2, b._4))
      assert(got == expected, s"format $fmt: $got")
    }
  }

  test("elements(): mixed corpus → uniform table with format metadata") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "# Doc 0\n\nbody: zero".getBytes(utf8)),
      (1L, "<h1>Doc 1</h1><p>body: one</p>".getBytes(utf8)),
      (2L, DocxElementReader.synthesize(Seq(
        DocxElementReader.SHeading(1, "Doc 2"),
        DocxElementReader.SPara("body: two")))),
      (3L, PdfElementReader.synthesize(Seq(Seq(
        PdfElementReader.SHeading(1, "Doc 3"),
        PdfElementReader.SPara("body: three")))))
    ).toDF("doc_id", "content")
    val got = AutoElementReader.elements(spark, docs).collect()
      .sortBy(e => (e.doc_id, e.seq))
    assert(got.length == 8)
    assert(got.map(_.kind).toSeq ==
      Seq("header", "paragraph", "header", "paragraph",
        "header", "paragraph", "header", "paragraph"))
    assert(got.map(_.metadata("format")).distinct.toSeq ==
      Seq("markdown", "html", "docx", "pdf"))
    // only the PDF leg carries page provenance
    assert(got.filter(_.doc_id == 3L).forall(_.page_number.contains(1)))
    assert(got.filter(_.doc_id < 3L).forall(_.page_number.isEmpty))
  }

  test("zip that is not a DOCX degrades to empty, garbage never throws") {
    // a real zip container without word/document.xml
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("hi".getBytes(utf8)); z.closeEntry(); z.close()
    assert(AutoElementReader.detect(bos.toByteArray) == "docx")
    assert(AutoElementReader.parseBlocks(bos.toByteArray).isEmpty)
    val rnd = new scala.util.Random(7)
    AutoElementReader.parseBlocks(
      Array.fill[Byte](50000)(rnd.nextInt(256).toByte)) // must not throw
  }
}
