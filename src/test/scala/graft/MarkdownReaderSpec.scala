package graft

import graft.sources.MarkdownElementReader
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's MarkdownReaderTests
  * (test/Microsoft.Extensions.DataIngestion.Tests/MarkdownReaderTests.cs):
  * headers with levels, paragraphs, fenced code, pipe tables (cell
  * text), images (alt text), quotes, lists, thematic breaks skipped.
  */
class MarkdownReaderSpec extends SparkSpecBase {

  test("elements: pageCol and metaCols propagate onto every parsed element") {
    import spark.implicits._
    // paged input: one row per page, like the reference's paged readers
    // (DocumentIntelligenceReader sets PageNumber per page section)
    val paged = Seq(
      (1L, 1, "a.pdf", "# Title\n\nFirst page text."),
      (1L, 2, "a.pdf", "Second page text.")
    ).toDF("doc_id", "page", "source", "text")
    val out = MarkdownElementReader.elements(spark, paged,
      pageCol = Some("page"), metaCols = Seq("source")).collect()
    assert(out.length == 3)
    assert(out.filter(_.page_number.contains(1)).map(_.kind).sorted.toSeq ==
      Seq("header", "paragraph"))
    assert(out.filter(_.page_number.contains(2)).map(_.text).toSeq ==
      Seq("Second page text."))
    assert(out.forall(_.metadata == Map("source" -> "a.pdf")))
    // plain markdown: no page, empty metadata
    val plain = MarkdownElementReader.elements(spark,
      Seq((2L, "hello")).toDF("doc_id", "text")).collect()
    assert(plain.forall(e => e.page_number.isEmpty && e.metadata.isEmpty))
  }

  test("headers and paragraphs in document order") {
    val md = "# Title\n\nHello world.\n\n## Sub *section*\n\nMore text\nsame paragraph."
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(b => (b._1, b._2)) ==
      Seq(("header", 1), ("paragraph", 0), ("header", 2), ("paragraph", 0)))
    assert(blocks(0)._4 == "Title")
    assert(blocks(2)._4 == "Sub section") // inline markdown stripped
    assert(blocks(3)._4 == "More text same paragraph.") // soft wrap joined
  }

  test("fenced code keeps body text without fences") {
    val md = "```scala\nval x = 1\nval y = 2\n```"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(_._1) == Seq("code"))
    assert(blocks.head._4 == "val x = 1\nval y = 2")
    assert(blocks.head._3.startsWith("```scala"))
  }

  test("pipe table: cells extracted, separator row dropped") {
    val md = "| a | b |\n|---|---|\n| 1 | 2 |\n| 3 | 4 |"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(_._1) == Seq("table"))
    assert(blocks.head._4 == "a b 1 2 3 4")
  }

  test("image yields alt text; paragraph after thematic break is a footer") {
    // MarkdownReader.cs:152-155: previousWasBreak → ParagraphBlock
    // maps to IngestionDocumentFooter
    val md = "![the alt](http://x/y.png)\n\n---\n\ntext"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(_._1) == Seq("image", "footer"))
    assert(blocks.head._4 == "the alt")
    // the footer flag clears after one element: a later paragraph is normal
    val more = MarkdownElementReader.parseBlocks("---\n\nfooter line\n\nnormal para")
    assert(more.map(_._1) == Seq("footer", "paragraph"))
  }

  test("quotes and lists flatten to their child elements (Section semantics)") {
    // the reference wraps these in Sections but EnumerateContent yields
    // only children (IngestionDocument.cs:42-67) — one element per list
    // item, quote bodies re-parsed
    val md = "> quoted line\n> second\n\n- item one\n- item two\n1. third"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(_._1) == Seq("paragraph", "paragraph", "paragraph", "paragraph"))
    assert(blocks(0)._4 == "quoted line second")
    assert(blocks(1)._4 == "item one")
    assert(blocks(2)._4 == "item two")
    assert(blocks(3)._4 == "third")
  }

  test("setext headers parse as headers, not paragraph + break") {
    val md = "Top Title\n=========\n\nbody text\n\nSecond *Level*\n---\n\nmore"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(b => (b._1, b._2)) ==
      Seq(("header", 1), ("paragraph", 0), ("header", 2), ("paragraph", 0)))
    assert(blocks(0)._4 == "Top Title")
    assert(blocks(2)._4 == "Second Level") // inline stripped
    // a bare --- with no pending paragraph is still a thematic break
    assert(MarkdownElementReader.parseBlocks("---\n\nx").map(_._1) == Seq("footer"))
  }

  test("quote containing a header and an image keeps child kinds") {
    val md = "> # Quoted Header\n> ![pic](u.png)\n> plain"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(_._1) == Seq("header", "image", "paragraph"))
    assert(blocks(0)._2 == 1 && blocks(0)._4 == "Quoted Header")
    assert(blocks(1)._4 == "pic")
  }

  test("image list items stay image elements") {
    val md = "- ![a1](u1.png)\n- text item"
    val blocks = MarkdownElementReader.parseBlocks(md)
    assert(blocks.map(_._1) == Seq("image", "paragraph"))
    assert(blocks(0)._4 == "a1")
  }

  test("parseBlocks never throws and is deterministic on arbitrary input (fuzz)") {
    // at corpus scale every malformed document WILL occur; the parser
    // must degrade to paragraphs, never crash the task
    val rnd = new scala.util.Random(42)
    val fragments = Seq(
      "# h", "## ", "```", "```scala", "|a|b|", "|-|-|", "> q", ">> d", "- i",
      "1. n", "===", "---", "***", "![a](u)", "![", "](", "**b", "`c", "", " ",
      "\t", "plain text here", "| lone pipe", "-", "=", "4.2", "<div>", "</div>"
    )
    for (_ <- 1 to 200) {
      val doc = Seq.fill(rnd.nextInt(30))(fragments(rnd.nextInt(fragments.length)))
        .mkString("\n")
      val a = MarkdownElementReader.parseBlocks(doc)
      val b = MarkdownElementReader.parseBlocks(doc)
      assert(a == b)
      assert(a.forall(e => e._3 != null && e._4 != null))
    }
  }

  test("pathologically deep quote nesting degrades flat instead of overflowing the stack") {
    val deep = (">" * 10000) + " abyss"
    val blocks = MarkdownElementReader.parseBlocks(deep) // must not StackOverflowError
    assert(blocks.nonEmpty && blocks.exists(_._4.contains("abyss")))
    // a realistic nested quote still recurses normally
    val ok = MarkdownElementReader.parseBlocks("> > > deep but fine")
    assert(ok.map(_._1) == Seq("paragraph") && ok.head._4 == "deep but fine")
  }

  test("inline markdown stripping") {
    assert(MarkdownElementReader.stripInline("**bold** and *em* and `code` and [link](u)") ==
      "bold and em and code and link")
  }

  test("empty and null-ish inputs") {
    assert(MarkdownElementReader.parseBlocks("").isEmpty)
    assert(MarkdownElementReader.parseBlocks("\n\n\n").isEmpty)
  }
}
