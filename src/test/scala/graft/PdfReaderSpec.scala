package graft

import graft.sources.PdfElementReader
import graft.sources.PdfElementReader._
/** PdfElementReader — the in-process PDF leg of the MarkItDownReader
  * twin (reference: MarkItDownReader.cs:51-74 shells out for PDF;
  * here the common-case subset is parsed with the JDK alone).
  * Covers: synthesis roundtrip, COS string forms, text-state
  * operators, Flate + ObjStm decoding, ToUnicode CMaps, structural
  * grouping/heading inference, and the degrade-never-throw contract
  * on hostile input.
  */
class PdfReaderSpec extends SparkSpecBase {

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Hand-built PDF from raw object bodies (no xref — the reader's
    * scanner must not need one; synthesize() covers the classic-xref
    * layout). */
  private def rawPdf(objs: (Int, String)*): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    objs.foreach { case (n, body) =>
      sb.append(s"$n 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append("%%EOF\n")
    sb.toString.getBytes(latin1)
  }

  /** Single-page skeleton around a content stream (uncompressed, no
    * /Length — exercises the endstream-search fallback). */
  private def onePage(content: String, fontExtra: String = ""): Array[Byte] =
    rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica $fontExtra >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      5 -> s"<< >>\nstream\n$content\nendstream")

  private def texts(pdf: Array[Byte]): Seq[String] =
    PdfElementReader.parseBlocks(pdf).map(_._4)

  // ------------------------------------------------------------------
  // synthesis roundtrip
  // ------------------------------------------------------------------
  test("synthesize → parseBlocks roundtrip: headings, paragraphs, pages") {
    val pdf = synthesize(Seq(
      Seq(SHeading(1, "Title"), SPara("first paragraph"),
        SPara("second paragraph")),
      Seq(SHeading(2, "Section"), SPara("page two body"))))
    val blocks = PdfElementReader.parseBlocks(pdf)
    assert(blocks == Seq(
      ("header", 1, "# Title", "Title", 1),
      ("paragraph", 0, "first paragraph", "first paragraph", 1),
      ("paragraph", 0, "second paragraph", "second paragraph", 1),
      ("header", 2, "## Section", "Section", 2),
      ("paragraph", 0, "page two body", "page two body", 2)))
  }

  test("roundtrip escapes parens and backslashes in text") {
    val tricky = """a (nested (deep)) and \ backslash"""
    val pdf = synthesize(Seq(Seq(SPara(tricky), SPara("x" * 80))))
    assert(texts(pdf).head == tricky)
  }

  test("heading levels follow size rank; body is the weight-dominant size") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "h one"), SHeading(2, "h two"), SHeading(3, "h three"),
      SPara("body text long enough to dominate the size-weight vote"))))
    val got = PdfElementReader.parseBlocks(pdf).map(b => (b._1, b._2))
    assert(got == Seq(("header", 1), ("header", 2), ("header", 3),
      ("paragraph", 0)))
  }

  // ------------------------------------------------------------------
  // COS strings and operators (hand-built content)
  // ------------------------------------------------------------------
  test("literal string escapes: \\( \\) \\\\ octal and raw newline") {
    val pdf = onePage(
      "BT /F1 11 Tf 72 700 Td (a\\(b\\)c\\\\d \\101 x\ny) Tj ET")
    assert(texts(pdf) == Seq("a(b)c\\d A x y")) // \101 = 'A'; newline collapses
  }

  test("hex strings decode, odd digit pads zero") {
    val pdf = onePage("BT /F1 11 Tf 72 700 Td <48656C6C6F> Tj ET")
    assert(texts(pdf) == Seq("Hello"))
  }

  test("TJ kerning: large negative gap becomes a space, small does not") {
    val pdf = onePage(
      "BT /F1 11 Tf 72 700 Td [(Hello) -300 (world) -50 (!)] TJ ET")
    assert(texts(pdf) == Seq("Hello world!"))
  }

  test("Td line steps group into one paragraph; big gap splits blocks") {
    val pdf = onePage(
      "BT /F1 11 Tf 72 700 Td (line one) Tj 0 -13.2 Td (line two) Tj ET\n" +
        "BT /F1 11 Tf 72 650 Td (next para) Tj ET")
    assert(texts(pdf) == Seq("line one line two", "next para"))
  }

  test("T* with TL and the ' operator advance lines") {
    val pdf = onePage(
      "BT /F1 11 Tf 14 TL 72 700 Td (a) Tj T* (b) Tj (c) ' ET")
    // three lines, each 14pt apart: 13.2-gap grouping keeps them in
    // one paragraph only if gap <= 19.8 — 14 < 19.8, so one block
    assert(texts(pdf) == Seq("a b c"))
  }

  test("Tm sets absolute y and scale; q/Q save and restore text state") {
    val pdf = onePage(
      "BT /F1 20 Tf 1 0 0 1 72 700 Tm (Big Heading) Tj ET\n" +
        "q BT /F1 11 Tf 72 650 Td (body paragraph that is long enough to win) Tj ET Q\n" +
        "BT 72 600 Td (restored heading) Tj ET") // font size 20 restored by Q
    val got = PdfElementReader.parseBlocks(pdf).map(b => (b._1, b._4))
    assert(got == Seq(
      ("header", "Big Heading"),
      ("paragraph", "body paragraph that is long enough to win"),
      ("header", "restored heading")))
  }

  test("inline image binary (BI..ID..EI) is skipped, following text read") {
    val pdf = onePage(
      "BT /F1 11 Tf 72 700 Td (before) Tj ET\n" +
        "BI /W 2 /H 2 ID \u0000\u00ff(\u0012)A EI\n" +
        "BT /F1 11 Tf 72 650 Td (after) Tj ET")
    assert(texts(pdf) == Seq("before", "after"))
  }

  // ------------------------------------------------------------------
  // simple-font /Encoding: WinAnsi base + /Differences (r8 verdict
  // item 3 — the producer-quirk space real office exports live in)
  // ------------------------------------------------------------------
  test("/WinAnsiEncoding name decodes the 0x80-0x9F typography range") {
    // bytes 0x93/0x94 are curly quotes in WinAnsi but C1 controls in
    // Latin-1 — the fallback used to emit the controls
    val pdf = onePage(
      s"BT /F1 11 Tf 72 700 Td (${0x93.toChar}quoted${0x94.toChar} café ${0x96.toChar} dash) Tj ET",
      fontExtra = "/Encoding /WinAnsiEncoding")
    assert(texts(pdf) == Seq("“quoted” café – dash"))
  }

  test("/Differences overrides decode through the glyph list") {
    val pdf = onePage(
      s"BT /F1 11 Tf 72 700 Td (caf${0x80.toChar} ${0x81.toChar} list) Tj ET",
      fontExtra = "/Encoding << /BaseEncoding /WinAnsiEncoding " +
        "/Differences [ 128 /eacute /bullet ] >>")
    // 128 → /eacute, running code: 129 → /bullet (WinAnsi would say
    // € and an undefined slot — Differences must win)
    assert(texts(pdf) == Seq("café • list"))
  }

  test("/Differences: unknown glyph falls back to base, uniXXXX decodes") {
    val pdf = onePage(
      s"BT /F1 11 Tf 72 700 Td (x${0x82.toChar}y ${0x83.toChar}z) Tj ET",
      fontExtra = "/Encoding << /BaseEncoding /WinAnsiEncoding " +
        "/Differences [ 130 /notarealglyphname 131 /uni2603 ] >>")
    // 0x82: unmappable name → WinAnsi base (single low quote);
    // 0x83: uniXXXX AGL rule → snowman
    assert(texts(pdf) == Seq("x‚y ☃z"))
  }

  // ------------------------------------------------------------------
  // ruled-table extraction (r8 verdict item 7, simple bordered case)
  // ------------------------------------------------------------------
  test("synthesized ruled table roundtrips as a pipe-markdown table element") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Inventory"),
      STable(Seq(Seq("name", "qty"), Seq("bolt", "7"), Seq("nut", "12"))),
      SPara("after the table"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got == Seq(
      ("header", 1, "# Inventory", "Inventory", 1),
      ("table", 0,
        "| name | qty |\n| --- | --- |\n| bolt | 7 |\n| nut | 12 |",
        "name qty bolt 7 nut 12", 1),
      ("paragraph", 0, "after the table", "after the table", 1)), got.toString)
  }

  test("ruled table: cell text is excluded from the body-size vote") {
    // a big table + one heading + one short para: if cell text leaked
    // into the line stream it would dominate the size vote and demote
    // the heading — the table consumption must keep inference intact
    val rows = (1 to 8).map(i => Seq(s"k$i", s"v$i"))
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "T"), STable(Seq(Seq("a", "b")) ++ rows), SPara("tail"))))
    val kinds = PdfElementReader.parseBlocks(pdf).map(_._1)
    assert(kinds == Seq("header", "table", "paragraph"), kinds.toString)
  }

  test("partial rules degrade to paragraphs, never a fake table") {
    // only horizontal rules (no verticals): not a grid
    val hOnly = onePage(
      "72 700 m 400 700 l S\n72 650 m 400 650 l S\n72 600 m 400 600 l S\n" +
        "BT /F1 11 Tf 80 680 Td (just lined paper) Tj ET")
    assert(PdfElementReader.parseBlocks(hOnly).map(b => (b._1, b._4)) ==
      Seq(("paragraph", "just lined paper")))
    // a single ruled box (1 cell) is a frame, not a table
    val box = onePage(
      "72 700 m 300 700 l S\n72 600 m 300 600 l S\n" +
        "72 600 m 72 700 l S\n300 600 m 300 700 l S\n" +
        "BT /F1 11 Tf 80 650 Td (framed callout text) Tj ET")
    assert(PdfElementReader.parseBlocks(box).map(b => (b._1, b._4)) ==
      Seq(("paragraph", "framed callout text")))
    // a rule that does not span the grid: ambiguous → no table
    val ragged = onePage(
      "72 700 m 400 700 l S\n72 650 m 400 650 l S\n72 600 m 200 600 l S\n" +
        "72 600 m 72 700 l S\n236 600 m 236 700 l S\n400 600 m 400 700 l S\n" +
        "BT /F1 11 Tf 80 680 Td (cell-ish) Tj ET")
    assert(PdfElementReader.parseBlocks(ragged).map(_._1) == Seq("paragraph"))
    // unpainted path (n = clip, not drawn): rules don't exist
    val clipped = onePage(
      "72 700 m 400 700 l n\n72 650 m 400 650 l n\n72 600 m 400 600 l n\n" +
        "72 600 m 72 700 l n\n236 600 m 236 700 l n\n400 600 m 400 700 l n\n" +
        "BT /F1 11 Tf 80 680 Td (clip path only) Tj ET\n" +
        "BT /F1 11 Tf 80 630 Td (second cell) Tj ET")
    assert(PdfElementReader.parseBlocks(clipped).map(_._1).forall(_ == "paragraph"))
  }

  // ------------------------------------------------------------------
  // row-rules-only tables (r9 verdict item 2 — the booktabs shape)
  // ------------------------------------------------------------------
  test("synthesized row-rules table roundtrips as a pipe-markdown table") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Results"),
      SRowRuleTable(Seq(Seq("name", "qty"), Seq("bolt", "7"), Seq("nut", "12"))),
      SPara("after the table"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got == Seq(
      ("header", 1, "# Results", "Results", 1),
      ("table", 0,
        "| name | qty |\n| --- | --- |\n| bolt | 7 |\n| nut | 12 |",
        "name qty bolt 7 nut 12", 1),
      ("paragraph", 0, "after the table", "after the table", 1)), got.toString)
  }

  test("row-rules: continuation shows merge into their column, no fake column") {
    // "bolt"+"heavy" are two shows in one cell; the one-off x start
    // (101) must NOT become a column — a column start repeats in ≥2
    // lines (here 77 and 197 do, across all three baselines)
    val pdf = onePage(
      "72 700 m 400 700 l S\n72 678 m 400 678 l S\n72 634 m 400 634 l S\n" +
        "BT /F1 11 Tf 77 685 Td (name) Tj ET\n" +
        "BT /F1 11 Tf 197 685 Td (qty) Tj ET\n" +
        "BT /F1 11 Tf 77 663 Td (bolt) Tj ET\n" +
        "BT /F1 11 Tf 101 663 Td (heavy) Tj ET\n" +
        "BT /F1 11 Tf 197 663 Td (7) Tj ET\n" +
        "BT /F1 11 Tf 77 641 Td (nut) Tj ET\n" +
        "BT /F1 11 Tf 197 641 Td (12) Tj ET")
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got == Seq(("table", 0,
      "| name | qty |\n| --- | --- |\n| bolt heavy | 7 |\n| nut | 12 |",
      "name qty bolt heavy 7 nut 12", 1)), got.toString)
  }

  test("row-rules degrade: prose between rules, side text, crossing vertical") {
    // two prose lines between 3 rules: every x start is one-off → <2
    // repeating columns → paragraphs, never a fake table
    val prose = onePage(
      "72 700 m 400 700 l S\n72 660 m 400 660 l S\n72 620 m 400 620 l S\n" +
        "BT /F1 11 Tf 77 680 Td (first prose line) Tj ET\n" +
        "BT /F1 11 Tf 150 640 Td (second prose line) Tj ET")
    assert(PdfElementReader.parseBlocks(prose).map(_._1).forall(_ == "paragraph"))
    // column-shaped text but a show STARTING outside the rule span:
    // ambiguous side text → degrade
    val side = onePage(
      "72 700 m 300 700 l S\n72 678 m 300 678 l S\n72 634 m 300 634 l S\n" +
        "BT /F1 11 Tf 77 685 Td (h1) Tj ET\nBT /F1 11 Tf 197 685 Td (h2) Tj ET\n" +
        "BT /F1 11 Tf 77 663 Td (a) Tj ET\nBT /F1 11 Tf 197 663 Td (b) Tj ET\n" +
        "BT /F1 11 Tf 350 663 Td (margin note) Tj ET")
    assert(PdfElementReader.parseBlocks(side).map(_._1).forall(_ == "paragraph"))
    // a vertical rule crossing the band: (broken-)grid territory, not
    // a row-rules table → degrade
    val vert = onePage(
      "72 700 m 400 700 l S\n72 678 m 400 678 l S\n72 634 m 400 634 l S\n" +
        "150 640 m 150 690 l S\n" +
        "BT /F1 11 Tf 77 685 Td (h1) Tj ET\nBT /F1 11 Tf 197 685 Td (h2) Tj ET\n" +
        "BT /F1 11 Tf 77 663 Td (a) Tj ET\nBT /F1 11 Tf 197 663 Td (b) Tj ET")
    assert(PdfElementReader.parseBlocks(vert).map(_._1).forall(_ == "paragraph"))
    // only 2 rules (an hr pair is not a table signature) → degrade
    val two = onePage(
      "72 700 m 400 700 l S\n72 634 m 400 634 l S\n" +
        "BT /F1 11 Tf 77 685 Td (h1) Tj ET\nBT /F1 11 Tf 197 685 Td (h2) Tj ET\n" +
        "BT /F1 11 Tf 77 663 Td (a) Tj ET\nBT /F1 11 Tf 197 663 Td (b) Tj ET")
    assert(PdfElementReader.parseBlocks(two).map(_._1).forall(_ == "paragraph"))
  }

  test("row-rules: a partial-span rule (cmidrule) does not break the stack") {
    // booktabs \cmidrule spans only some columns; it lands in its own
    // span-group (≠ the full-width stack) and must neither join the
    // stack nor degrade it — the full-width table still parses
    val pdf = onePage(
      "72 700 m 400 700 l S\n72 678 m 400 678 l S\n72 634 m 400 634 l S\n" +
        "197 681 m 280 681 l S\n" + // partial rule under a group header
        "BT /F1 11 Tf 77 690 Td (name) Tj ET\n" +
        "BT /F1 11 Tf 197 690 Td (qty) Tj ET\n" +
        "BT /F1 11 Tf 77 663 Td (bolt) Tj ET\n" +
        "BT /F1 11 Tf 197 663 Td (7) Tj ET\n" +
        "BT /F1 11 Tf 77 641 Td (nut) Tj ET\n" +
        "BT /F1 11 Tf 197 641 Td (12) Tj ET")
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got == Seq(("table", 0,
      "| name | qty |\n| --- | --- |\n| bolt | 7 |\n| nut | 12 |",
      "name qty bolt 7 nut 12", 1)), got.toString)
  }

  test("stacked row-rules tables split at the prose slab, in reading order") {
    // prose between two same-width rule stacks must NOT merge them
    // into one table (the grid detector gets this from segment
    // connectivity; rules alone don't connect — the slab-tabularity
    // split does the same job here)
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Report"),
      SRowRuleTable(Seq(Seq("a", "b"), Seq("1", "2"))),
      SPara("between"),
      SRowRuleTable(Seq(Seq("x", "y"), Seq("3", "4"))),
      SPara("end"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "Report"),
      ("table", "a b 1 2"),
      ("paragraph", "between"),
      ("table", "x y 3 4"),
      ("paragraph", "end")), got.toString)
    // back-to-back (no prose): the EMPTY slab splits them
    val pdf2 = synthesize(Seq(Seq(
      SRowRuleTable(Seq(Seq("a", "b"), Seq("1", "2"))),
      SRowRuleTable(Seq(Seq("x", "y"), Seq("3", "4"))))))
    val got2 = PdfElementReader.parseBlocks(pdf2)
    assert(got2.map(b => (b._1, b._4)) == Seq(
      ("table", "a b 1 2"), ("table", "x y 3 4")), got2.toString)
  }

  test("row-rules: seeded fuzz roundtrip — every synthesized table recovers exactly") {
    // randomized shapes (2-8 rows, 2-4 cols, cells sometimes empty,
    // surrounded by headings/paragraphs) must parse back to the same
    // cell grid; determinism asserted by double-parse
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val nRows = 2 + rnd.nextInt(7)
      val nCols = 2 + rnd.nextInt(3)
      // forced cells keep the contract satisfiable: the header row and
      // first body row are fully populated (booktabs headers label
      // every column — and each SLAB needs ≥1 multi-column line or it
      // reads as prose and splits the stack, the documented trade),
      // every later row keeps ≥1 show so its baseline exists;
      // everything else goes empty at random
      val forced = (0 until nRows).map(r => (r, r % nCols)).toSet ++
        (0 until nCols).flatMap(c => Seq((0, c), (1, c)))
      val rows = (0 until nRows).map { r =>
        (0 until nCols).map { c =>
          if (forced((r, c)) || rnd.nextInt(5) > 0) s"c${trial}r${r}v$c"
          else ""
        }
      }
      val pdf = synthesize(Seq(Seq(
        SHeading(1, s"T$trial"),
        SRowRuleTable(rows),
        SPara(s"tail $trial"))))
      val got = PdfElementReader.parseBlocks(pdf)
      assert(got.map(_._1) == Seq("header", "table", "paragraph"),
        s"trial $trial: ${got.map(b => (b._1, b._4))}")
      val expectedMd = rows.head.mkString("| ", " | ", " |") + "\n" +
        Seq.fill(nCols)("---").mkString("| ", " | ", " |") +
        rows.tail.map(r => "\n" + r.mkString("| ", " | ", " |")).mkString
      assert(got(1)._3 == expectedMd, s"trial $trial:\n${got(1)._3}\nvs\n$expectedMd")
      assert(got == PdfElementReader.parseBlocks(pdf)) // deterministic
    }
  }

  // borderless tables (r10 verdict item 2 — the no-rules shape)

  test("synthesized borderless table roundtrips as a pipe-markdown table") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Title"),
      SBorderlessTable(Seq(Seq("name", "qty"), Seq("bolt", "7"), Seq("nut", "12"))),
      SPara("after the table"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "Title"),
      ("table", "name qty bolt 7 nut 12"),
      ("paragraph", "after the table")), got.toString)
    assert(got(1)._3 ==
      "| name | qty |\n| --- | --- |\n| bolt | 7 |\n| nut | 12 |")
    assert(got == PdfElementReader.parseBlocks(pdf)) // deterministic
  }

  test("borderless degrade: short runs, ragged pitch, overflowing cells all stay prose") {
    // 2 rows only: below the ≥3-baseline bar — prose
    val pdf2 = synthesize(Seq(Seq(
      SBorderlessTable(Seq(Seq("a", "b"), Seq("1", "2"))), SPara("x"))))
    // (the synthesizer itself refuses <3 rows, so nothing aligned is
    // even emitted — parse must see only the paragraph)
    assert(PdfElementReader.parseBlocks(pdf2).forall(_._1 != "table"))
    // ragged pitch: three 2-show baselines at gaps 16 / 30 — prose
    val ragged = onePage(
      "BT /F1 11 Tf 72 700 Td (a1) Tj ET\nBT /F1 11 Tf 192 700 Td (b1) Tj ET\n" +
        "BT /F1 11 Tf 72 684 Td (a2) Tj ET\nBT /F1 11 Tf 192 684 Td (b2) Tj ET\n" +
        "BT /F1 11 Tf 72 654 Td (a3) Tj ET\nBT /F1 11 Tf 192 654 Td (b3) Tj ET")
    assert(PdfElementReader.parseBlocks(ragged).forall(_._1 != "table"),
      PdfElementReader.parseBlocks(ragged).toString)
    // overflowing cell: the long first-column text's glyph estimate
    // crosses the second column start — justified-2-col-prose
    // territory, degrade
    val long = "this cell text is far too long to fit"
    val overflow = onePage(
      (0 until 3).map { r =>
        s"BT /F1 11 Tf 72 ${700 - 16 * r} Td ($long) Tj ET\n" +
          s"BT /F1 11 Tf 192 ${700 - 16 * r} Td (v$r) Tj ET\n"
      }.mkString)
    assert(PdfElementReader.parseBlocks(overflow).forall(_._1 != "table"),
      PdfElementReader.parseBlocks(overflow).toString)
    // off-cluster show (kerned prose): one baseline's x matches no
    // repeated cluster — degrade
    val kerned = onePage(
      "BT /F1 11 Tf 72 700 Td (a1) Tj ET\nBT /F1 11 Tf 192 700 Td (b1) Tj ET\n" +
        "BT /F1 11 Tf 72 684 Td (a2) Tj ET\nBT /F1 11 Tf 145 684 Td (mid) Tj ET\n" +
        "BT /F1 11 Tf 72 668 Td (a3) Tj ET\nBT /F1 11 Tf 192 668 Td (b3) Tj ET")
    assert(PdfElementReader.parseBlocks(kerned).forall(_._1 != "table"),
      PdfElementReader.parseBlocks(kerned).toString)
  }

  test("borderless refuses regions the ruled detectors already adjudicated") {
    // aligned uniform rows WITH a horizontal rule through them: that
    // ink is (possibly degraded) row-rules territory — borderless
    // must not re-claim it
    val ruled = onePage(
      "BT /F1 11 Tf 72 700 Td (a1) Tj ET\nBT /F1 11 Tf 192 700 Td (b1) Tj ET\n" +
        "72 692 m 312 692 l S\n" + // a single stray rule (< 3: no row-rules fire)
        "BT /F1 11 Tf 72 684 Td (a2) Tj ET\nBT /F1 11 Tf 192 684 Td (b2) Tj ET\n" +
        "BT /F1 11 Tf 72 668 Td (a3) Tj ET\nBT /F1 11 Tf 192 668 Td (b3) Tj ET")
    assert(PdfElementReader.parseBlocks(ruled).forall(_._1 != "table"),
      PdfElementReader.parseBlocks(ruled).toString)
  }

  test("borderless coexists with ruled and row-rules tables on one page") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Mixed"),
      STable(Seq(Seq("g1", "g2"), Seq("1", "2"))),
      SBorderlessTable(Seq(Seq("n1", "n2"), Seq("3", "4"), Seq("5", "6"))),
      SPara("between"),
      SRowRuleTable(Seq(Seq("r1", "r2"), Seq("7", "8"))),
      SPara("end"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "Mixed"),
      ("table", "g1 g2 1 2"),
      ("table", "n1 n2 3 4 5 6"),
      ("paragraph", "between"),
      ("table", "r1 r2 7 8"),
      ("paragraph", "end")), got.toString)
  }

  // two-column reading order (r10 verdict item 3)

  test("two-column page reads left column then right, not interleaved") {
    val left = Seq("left one", "left two", "left three", "left four")
    val right = Seq("right one", "right two", "right three", "right four")
    val pdf = synthesize(Seq(Seq(
      STwoColPara(left, right))))
    val got = PdfElementReader.parseBlocks(pdf)
    val paras = got.filter(_._1 == "paragraph").map(_._4)
    assert(paras == Seq(left.mkString(" "), right.mkString(" ")),
      got.toString)
    // and a second page with single-column prose is untouched
    val both = synthesize(Seq(
      Seq(STwoColPara(left, right)),
      Seq(SPara("plain page two"))))
    val got2 = PdfElementReader.parseBlocks(both)
    assert(got2.map(b => (b._1, b._4, b._5)) == Seq(
      ("paragraph", left.mkString(" "), 1),
      ("paragraph", right.mkString(" "), 1),
      ("paragraph", "plain page two", 2)), got2.toString)
  }

  test("two-column degrade: a full-width line spanning the gutter keeps y-order") {
    // the title line's glyph estimate crosses the gutter, so no clean
    // x-partition exists: the page must keep plain y-order
    val pdf = onePage(
      "BT /F1 11 Tf 72 720 Td (a full width title line spanning both columns here) Tj ET\n" +
        (0 until 4).map { i =>
          s"BT /F1 11 Tf 72 ${700 - 13 * i} Td (left $i) Tj ET\n" +
            s"BT /F1 11 Tf 330 ${694 - 13 * i} Td (right $i) Tj ET\n"
        }.mkString)
    val got = PdfElementReader.parseBlocks(pdf)
    val text = got.map(_._4).mkString(" ")
    // y-order interleaves: "left 0" is followed by "right 0", not "left 1"
    assert(text.indexOf("right 0") < text.indexOf("left 1"), got.toString)
  }

  test("two-column degrade: stacked bands (no vertical overlap) keep y-order") {
    // two x-bands but the right sits entirely BELOW the left: these
    // are sequential blocks, not columns — y-order already correct
    val pdf = onePage(
      (0 until 3).map(i =>
        s"BT /F1 11 Tf 72 ${700 - 13 * i} Td (top $i) Tj ET\n").mkString +
        (0 until 3).map(i =>
          s"BT /F1 11 Tf 330 ${500 - 13 * i} Td (bottom $i) Tj ET\n").mkString)
    val got = PdfElementReader.parseBlocks(pdf)
    val text = got.map(_._4).mkString(" ")
    assert(text.indexOf("top 2") < text.indexOf("bottom 0"), got.toString)
  }

  test("row-rules and bordered grid coexist on one page") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Mixed"),
      STable(Seq(Seq("g1", "g2"), Seq("1", "2"))),
      SPara("between"),
      SRowRuleTable(Seq(Seq("r1", "r2"), Seq("3", "4"))),
      SPara("end"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "Mixed"),
      ("table", "g1 g2 1 2"),
      ("paragraph", "between"),
      ("table", "r1 r2 3 4"),
      ("paragraph", "end")), got.toString)
  }

  test("re-drawn (rectangle) grid detects like stroked lines") {
    // 2×2 grid drawn as four cell rectangles — the border-per-cell
    // style some exporters use; shared edges cluster into one rule
    val pdf = onePage(
      "72 650 100 30 re S\n172 650 100 30 re S\n" +
        "72 620 100 30 re S\n172 620 100 30 re S\n" +
        "BT /F1 11 Tf 76 668 Td (h1) Tj ET\n" +
        "BT /F1 11 Tf 176 668 Td (h2) Tj ET\n" +
        "BT /F1 11 Tf 76 638 Td (a) Tj ET\n" +
        "BT /F1 11 Tf 176 638 Td (b) Tj ET")
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got == Seq(("table", 0,
      "| h1 | h2 |\n| --- | --- |\n| a | b |", "h1 h2 a b", 1)), got.toString)
  }

  test("two stacked tables on one page are both extracted in order") {
    val pdf = synthesize(Seq(Seq(
      SHeading(1, "Report"),
      STable(Seq(Seq("a", "b"), Seq("1", "2"))),
      SPara("between"),
      STable(Seq(Seq("x", "y"), Seq("3", "4"))),
      SPara("end"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("header", "Report"),
      ("table", "a b 1 2"),
      ("paragraph", "between"),
      ("table", "x y 3 4"),
      ("paragraph", "end")), got.toString)
  }

  test("side-by-side tables emit left-to-right at the same height") {
    def grid(x0: Int, cells: Seq[(String, String, String, String)]): String = {
      val x1 = x0 + 200
      // 2 cols x 2 rows, y 600..700
      s"$x0 700 m $x1 700 l S\n$x0 650 m $x1 650 l S\n$x0 600 m $x1 600 l S\n" +
        s"$x0 600 m $x0 700 l S\n${x0 + 100} 600 m ${x0 + 100} 700 l S\n" +
        s"$x1 600 m $x1 700 l S\n" +
        cells.map { case (a, b, c, d) =>
          s"BT /F1 11 Tf ${x0 + 5} 680 Td ($a) Tj ET\n" +
            s"BT /F1 11 Tf ${x0 + 105} 680 Td ($b) Tj ET\n" +
            s"BT /F1 11 Tf ${x0 + 5} 630 Td ($c) Tj ET\n" +
            s"BT /F1 11 Tf ${x0 + 105} 630 Td ($d) Tj ET\n"
        }.mkString
    }
    val pdf = onePage(grid(60, Seq(("L1", "L2", "L3", "L4"))) +
      grid(330, Seq(("R1", "R2", "R3", "R4"))))
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("table", "L1 L2 L3 L4"), ("table", "R1 R2 R3 R4")), got.toString)
  }

  test("nested (overlapping) grids are ambiguous: both degrade") {
    // outer 2x2 grid 72..472 x 550..750; inner 2x2 grid fully inside
    // the outer's top-left cell, not touching it — two valid grids
    // whose boxes overlap → neither is emitted, text stays paragraphs
    val outer =
      "72 750 m 472 750 l S\n72 650 m 472 650 l S\n72 550 m 472 550 l S\n" +
        "72 550 m 72 750 l S\n272 550 m 272 750 l S\n472 550 m 472 750 l S\n"
    val inner =
      "100 740 m 240 740 l S\n100 710 m 240 710 l S\n100 680 m 240 680 l S\n" +
        "100 680 m 100 740 l S\n170 680 m 170 740 l S\n240 680 m 240 740 l S\n"
    val pdf = onePage(outer + inner +
      "BT /F1 11 Tf 110 730 Td (i1) Tj ET\n" +
      "BT /F1 11 Tf 180 730 Td (i2) Tj ET\n" +
      "BT /F1 11 Tf 300 700 Td (o1) Tj ET\n" +
      "BT /F1 11 Tf 300 600 Td (o2) Tj ET")
    val got = PdfElementReader.parseBlocks(pdf)
    assert(got.forall(_._1 == "paragraph"), got.toString)
    assert(got.map(_._4).mkString(" ").split(" ").sorted.toSeq ==
      Seq("i1", "i2", "o1", "o2"), got.toString)
  }

  test("a segment bomb falls back to the bounded one-component path") {
    // 600 disjoint horizontal strokes (> MaxTableSegs): connectivity
    // is skipped, the single-component grid check fails (no verticals),
    // and the text survives as a paragraph — bounded, no table
    val strokes = (0 until 600).map { i =>
      val y = 60 + (i % 300) * 2; val x = 60 + (i / 300) * 250
      s"$x $y m ${x + 200} $y l S"
    }.mkString("\n")
    val pdf = onePage(strokes + "\nBT /F1 11 Tf 72 735 Td (still here) Tj ET")
    assert(PdfElementReader.parseBlocks(pdf).map(b => (b._1, b._4)) ==
      Seq(("paragraph", "still here")))
  }

  // ------------------------------------------------------------------
  // producer quirks: object order, inter-object garbage, incremental
  // updates (r8 verdict item 3)
  // ------------------------------------------------------------------
  private def pageObjs(content: String): Seq[(Int, String)] = Seq(
    1 -> "<< /Type /Catalog /Pages 2 0 R >>",
    2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
    3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    5 -> s"<< >>\nstream\n$content\nendstream")

  test("object order is irrelevant: shuffled bodies parse identically") {
    val objs = pageObjs("BT /F1 11 Tf 72 700 Td (order free) Tj ET")
    val expected = texts(rawPdf(objs: _*))
    assert(expected == Seq("order free"), "setup")
    for (perm <- Seq(objs.reverse, Seq(objs(2), objs(4), objs(0), objs(3), objs(1))))
      assert(texts(rawPdf(perm: _*)) == expected, perm.map(_._1).toString)
  }

  test("garbage bytes between objects are skipped by the scanner") {
    val objs = pageObjs("BT /F1 11 Tf 72 700 Td (survives junk) Tj ET")
    val junk = "\n% rogue comment >>>] (unterminated\nÞ­¾ï raw bytes { [ <act\n"
    val sb = new StringBuilder("%PDF-1.4\n")
    objs.foreach { case (n, body) =>
      sb.append(junk).append(s"$n 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append(junk).append("%%EOF\n")
    assert(texts(sb.toString.getBytes(latin1)) == Seq("survives junk"))
  }

  test("incremental update: the appended redefinition wins") {
    // a second body after %%EOF redefines the content stream — the
    // classic save-in-place layout; later definition must win
    val base = rawPdf(pageObjs("BT /F1 11 Tf 72 700 Td (original) Tj ET"): _*)
    val update = ("5 0 obj\n<< >>\nstream\n" +
      "BT /F1 11 Tf 72 700 Td (updated text) Tj ET" +
      "\nendstream\nendobj\nstartxref\n0\n%%EOF\n").getBytes(latin1)
    assert(texts(base ++ update) == Seq("updated text"))
    // two stacked updates: last one still wins
    val update2 = ("5 0 obj\n<< >>\nstream\n" +
      "BT /F1 11 Tf 72 700 Td (third revision) Tj ET" +
      "\nendstream\nendobj\nstartxref\n0\n%%EOF\n").getBytes(latin1)
    assert(texts(base ++ update ++ update2) == Seq("third revision"))
  }

  // ------------------------------------------------------------------
  // streams: Flate, /Length forms, ObjStm
  // ------------------------------------------------------------------
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  test("flate content stream with exact /Length decodes") {
    val content = deflate(
      "BT /F1 11 Tf 72 700 Td (compressed text) Tj ET".getBytes(latin1))
    val head = s"<< /Length ${content.length} /Filter /FlateDecode >>\nstream\n"
      .getBytes(latin1)
    val obj5 = new java.io.ByteArrayOutputStream
    obj5.write(head); obj5.write(content)
    obj5.write("\nendstream".getBytes(latin1))
    val pdf = {
      val pre = rawPdf(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
        3 -> "<< /Type /Font /Subtype /Type1 >>",
        4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
      val out = new java.io.ByteArrayOutputStream
      out.write(pre, 0, pre.length - "%%EOF\n".length)
      out.write("5 0 obj\n".getBytes(latin1))
      obj5.writeTo(out)
      out.write("\nendobj\n%%EOF\n".getBytes(latin1))
      out.toByteArray
    }
    assert(texts(pdf) == Seq("compressed text"))
  }

  test("indirect or wrong /Length falls back to endstream search") {
    val pdf = rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> "<< /Type /Font /Subtype /Type1 >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      5 -> "<< /Length 6 0 R >>\nstream\nBT /F1 11 Tf 72 700 Td (indirect length) Tj ET\nendstream",
      6 -> "47")
    assert(texts(pdf) == Seq("indirect length"))
  }

  test("objects inside an ObjStm (PDF 1.5) are found") {
    // catalog + pages + page dicts all live inside the object stream
    val subs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    val offsets = subs.map(_._2.length + 1).scanLeft(0)(_ + _)
    val members = subs.zip(offsets).map {
      case ((n, _), off) => s"$n $off" }.mkString(" ")
    val body = subs.map(_._2).mkString(" ")
    val first = members.length + 1
    val data = (members + " " + body).getBytes(latin1)
    val zipped = deflate(data)
    val out = new java.io.ByteArrayOutputStream
    out.write("%PDF-1.5\n".getBytes(latin1))
    out.write(("7 0 obj\n<< /Type /ObjStm /N 3 /First " + first +
      s" /Length ${zipped.length} /Filter /FlateDecode >>\nstream\n").getBytes(latin1))
    out.write(zipped)
    out.write("\nendstream\nendobj\n".getBytes(latin1))
    out.write(("3 0 obj\n<< /Type /Font /Subtype /Type1 >>\nendobj\n" +
      "5 0 obj\n<< >>\nstream\nBT /F1 11 Tf 72 700 Td (from objstm) Tj ET\nendstream\nendobj\n%%EOF\n")
      .getBytes(latin1))
    assert(texts(out.toByteArray) == Seq("from objstm"))
  }

  test("incremental update: later object definition wins") {
    val pdf = rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> "<< /Type /Font /Subtype /Type1 >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      5 -> "<< >>\nstream\nBT /F1 11 Tf 72 700 Td (old text) Tj ET\nendstream",
      5 -> "<< >>\nstream\nBT /F1 11 Tf 72 700 Td (new text) Tj ET\nendstream")
    assert(texts(pdf) == Seq("new text"))
  }

  // ------------------------------------------------------------------
  // fonts: ToUnicode, Type0
  // ------------------------------------------------------------------
  test("ToUnicode bfchar and bfrange (incl. array form) decode") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |2 beginbfchar
        |<41> <03A9>
        |<42> <00410042>
        |endbfchar
        |1 beginbfrange
        |<43> <45> <0061>
        |endbfrange
        |1 beginbfrange
        |<50> <51> [<0058> <0059>]
        |endbfrange
        |endcmap""".stripMargin
    val pdf = rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> "<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      5 -> "<< >>\nstream\nBT /F1 11 Tf 72 700 Td (ABCDEPQ) Tj ET\nendstream",
      6 -> s"<< >>\nstream\n$cmap\nendstream")
    // A→Ω, B→AB, C..E→a..c, P→X, Q→Y
    assert(texts(pdf) == Seq("ΩABabcXY"))
  }

  test("Type0 font without ToUnicode is skipped (no glyph-id garbage)") {
    val pdf = onePage(
      "BT /F1 11 Tf 72 700 Td (AB) Tj ET",
      fontExtra = "") // override subtype below
    val s = new String(pdf, latin1)
      .replace("/Subtype /Type1", "/Subtype /Type0")
    assert(PdfElementReader.parseBlocks(s.getBytes(latin1)).isEmpty)
  }

  test("Type0 WITH ToUnicode decodes 2-byte codes") {
    val cmap = "1 beginbfchar\n<4142> <00680069>\nendbfchar"
    val pdf = rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> "<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      5 -> "<< >>\nstream\nBT /F1 11 Tf 72 700 Td (AB) Tj ET\nendstream",
      6 -> s"<< >>\nstream\n$cmap\nendstream")
    assert(texts(pdf) == Seq("hi"))
  }

  // ------------------------------------------------------------------
  // robustness: degrade, never throw
  // ------------------------------------------------------------------
  test("garbage, truncation, and empty input yield empty, not exceptions") {
    assert(PdfElementReader.parseBlocks(null).isEmpty)
    assert(PdfElementReader.parseBlocks(Array.empty[Byte]).isEmpty)
    assert(PdfElementReader.parseBlocks("not a pdf at all".getBytes(latin1)).isEmpty)
    val rnd = new scala.util.Random(42)
    val junk = Array.fill[Byte](100000)(rnd.nextInt(256).toByte)
    PdfElementReader.parseBlocks(junk) // must not throw
    val good = synthesize(Seq(Seq(SPara("hello"))))
    PdfElementReader.parseBlocks(good.take(good.length / 2)) // must not throw
  }

  test("flate bomb is capped: oversized stream dropped, no OOM") {
    val bomb = deflate(new Array[Byte](PdfElementReader.MaxStreamBytes + (1 << 20)))
    val out = new java.io.ByteArrayOutputStream
    val pre = rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> "<< /Type /Font /Subtype /Type1 >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    out.write(pre, 0, pre.length - "%%EOF\n".length)
    out.write(s"5 0 obj\n<< /Length ${bomb.length} /Filter /FlateDecode >>\nstream\n"
      .getBytes(latin1))
    out.write(bomb)
    out.write("\nendstream\nendobj\n%%EOF\n".getBytes(latin1))
    assert(PdfElementReader.parseBlocks(out.toByteArray).isEmpty)
  }

  test("pathologically deep nesting is flattened, not a stack overflow") {
    val deep = "1 0 obj\n" + ("[" * 100000) + ("]" * 100000) + "\nendobj\n"
    val pdf = (new String(onePage("BT /F1 11 Tf 72 700 Td (ok) Tj ET"), latin1)
      .replace("%PDF-1.4\n", "%PDF-1.4\n" + deep)).getBytes(latin1)
    assert(texts(pdf) == Seq("ok"))
  }

  test("page-tree cycle does not loop forever") {
    val pdf = rawPdf(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 2 0 R 4 0 R ] /Count 1 /Resources << /Font << /F1 3 0 R >> >> >>",
      3 -> "<< /Type /Font /Subtype /Type1 >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      5 -> "<< >>\nstream\nBT /F1 11 Tf 72 700 Td (cycle ok) Tj ET\nendstream")
    assert(texts(pdf) == Seq("cycle ok"))
  }

  test("catalog-less file falls back to /Type/Page objects in order") {
    val pdf = rawPdf(
      3 -> "<< /Type /Font /Subtype /Type1 >>",
      4 -> "<< /Type /Page /Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
      5 -> "<< >>\nstream\nBT /F1 11 Tf 72 700 Td (no catalog) Tj ET\nendstream")
    assert(texts(pdf) == Seq("no catalog"))
  }

  // ------------------------------------------------------------------
  // elements() Dataset contract
  // ------------------------------------------------------------------
  test("elements(): page numbers, seq order, metadata passthrough") {
    val s = spark
    import s.implicits._
    val pdf = synthesize(Seq(
      Seq(SHeading(1, "T"), SPara("p one")), Seq(SPara("p two"))))
    val df = Seq((7L, pdf, "crawl")).toDF("doc_id", "content", "src")
    val got = PdfElementReader.elements(spark, df, metaCols = Seq("src"))
      .collect().sortBy(_.seq)
    assert(got.map(e => (e.seq, e.kind, e.text, e.page_number)).toSeq == Seq(
      (0, "header", "T", Some(1)),
      (1, "paragraph", "p one", Some(1)),
      (2, "paragraph", "p two", Some(2))))
    assert(got.forall(_.metadata == Map("src" -> "crawl")))
    assert(got.forall(_.doc_id == 7L))
  }

  // ------------------------------------------------------------------
  // Multi-page table continuation (r11): a table flowing across a page
  // break with its header repeated stitches into ONE element; every
  // ambiguous adjacency keeps both tables.
  // ------------------------------------------------------------------
  private val contHeader = Seq("item", "qty")

  test("continuation stitch: repeated-header table across a page break merges") {
    val pdf = synthesize(Seq(
      Seq(SPara("intro paragraph before the ledger"),
        STable(Seq(contHeader, Seq("apples", "1"), Seq("pears", "2")))),
      Seq(STable(Seq(contHeader, Seq("plums", "3"), Seq("figs", "4"))),
        SPara("prose after the table ends"))))
    val blocks = PdfElementReader.parseBlocks(pdf)
    assert(blocks.map(b => (b._1, b._5)) == Seq(
      ("paragraph", 1), ("table", 1), ("paragraph", 2)))
    val md = blocks(1)._3
    assert(md == Seq(
      "| item | qty |", "| --- | --- |",
      "| apples | 1 |", "| pears | 2 |",
      "| plums | 3 |", "| figs | 4 |").mkString("\n"))
    // header cells appear ONCE in the text field
    assert(blocks(1)._4 == "item qty apples 1 pears 2 plums 3 figs 4")
  }

  test("continuation stitch: three-page chain folds, across detector styles") {
    // the table STARTS ruled, continues as row-rules, ends borderless —
    // all three emit the same pipe-md, so the stitch is ink-agnostic
    val pdf = synthesize(Seq(
      Seq(STable(Seq(contHeader, Seq("a", "1")))),
      Seq(SRowRuleTable(Seq(contHeader, Seq("b", "2"), Seq("c", "3")))),
      Seq(SBorderlessTable(Seq(contHeader, Seq("d", "4"), Seq("e", "5"))),
        SPara("done"))))
    val blocks = PdfElementReader.parseBlocks(pdf)
    assert(blocks.map(b => (b._1, b._5)) == Seq(("table", 1), ("paragraph", 3)))
    val body = blocks.head._3.split("\n").drop(2).toSeq
    assert(body == Seq("| a | 1 |", "| b | 2 |", "| c | 3 |",
      "| d | 4 |", "| e | 5 |"))
  }

  test("continuation stitch degrades: differing header, caption between, empty page") {
    // a DIFFERENT header on the next page is a new table
    val diff = synthesize(Seq(
      Seq(STable(Seq(contHeader, Seq("a", "1")))),
      Seq(STable(Seq(Seq("sku", "qty"), Seq("b", "2"))))))
    assert(PdfElementReader.parseBlocks(diff).count(_._1 == "table") == 2)
    // a caption between the tables breaks first-of-page → two tables
    val caption = synthesize(Seq(
      Seq(STable(Seq(contHeader, Seq("a", "1")))),
      Seq(SPara("Table 2 continued differently"),
        STable(Seq(contHeader, Seq("b", "2"))))))
    assert(PdfElementReader.parseBlocks(caption).count(_._1 == "table") == 2)
    // an empty page between is a page GAP, not an adjacency
    val gap = synthesize(Seq(
      Seq(STable(Seq(contHeader, Seq("a", "1")))),
      Seq.empty,
      Seq(STable(Seq(contHeader, Seq("b", "2"))))))
    val gapBlocks = PdfElementReader.parseBlocks(gap)
    assert(gapBlocks.count(_._1 == "table") == 2)
    assert(gapBlocks.map(_._5) == Seq(1, 3))
    // same-page tables never stitch (the side-by-side / stacked shape
    // is the ruled detector's own two-tables contract)
    val same = synthesize(Seq(
      Seq(STable(Seq(contHeader, Seq("a", "1"))),
        SPara("between"),
        STable(Seq(contHeader, Seq("b", "2"))))))
    assert(PdfElementReader.parseBlocks(same).count(_._1 == "table") == 2)
  }

  // ------------------------------------------------------------------
  // Image XObject placements (r12): Do -> image element, /Alt alt text
  // ------------------------------------------------------------------

  test("image Do placement emits an image element in reading order") {
    val got = PdfElementReader.parseBlocks(synthesize(Seq(Seq(
      SHeading(1, "Title"), SPara("before fig"),
      SImage("a scenic chart"), SPara("after fig")))))
    assert(got.map(b => (b._1, b._4, b._5)) == Seq(
      ("header", "Title", 1), ("paragraph", "before fig", 1),
      ("image", "a scenic chart", 1), ("paragraph", "after fig", 1)))
    assert(got(2)._3 == "![a scenic chart]()")
  }

  test("an image XObject without /Alt emits an empty-text image element") {
    val bytes = synthesize(Seq(Seq(SPara("p"), SImage("MARKER"))))
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val noAlt = raw.replace("/Alt (MARKER) ", "")
    val got = PdfElementReader.parseBlocks(
      noAlt.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("paragraph", "p"), ("image", "")))
  }

  test("a Do of a missing or non-image XObject emits nothing") {
    val bytes = synthesize(Seq(Seq(SPara("p"), SImage("x"))))
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val form = raw.replace("/Subtype /Image", "/Subtype /Form")
    val gotForm = PdfElementReader.parseBlocks(
      form.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(gotForm.map(b => (b._1, b._4)) == Seq(("paragraph", "p")))
    // drop the XObject registration from the Resources dict (the Do
    // itself sits inside the compressed content stream): the operand
    // name no longer resolves to an image and must be skipped
    val xat = raw.indexOf(" /XObject << ")
    assert(xat > 0)
    val missing = raw.substring(0, xat) +
      raw.substring(raw.indexOf(" >>", xat) + 3)
    val gotMissing = PdfElementReader.parseBlocks(
      missing.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(gotMissing.map(b => (b._1, b._4)) == Seq(("paragraph", "p")))
  }

  test("an image-only PDF still emits its image elements") {
    val got = PdfElementReader.parseBlocks(synthesize(Seq(Seq(
      SImage("lonely figure")))))
    assert(got.map(b => (b._1, b._4, b._5)) == Seq(
      ("image", "lonely figure", 1)))
  }

  test("multiple images keep placement order across pages") {
    val got = PdfElementReader.parseBlocks(synthesize(Seq(
      Seq(SPara("p1"), SImage("fig one")),
      Seq(SImage("fig two"), SPara("p2")))))
    assert(got.map(b => (b._1, b._4, b._5)) == Seq(
      ("paragraph", "p1", 1), ("image", "fig one", 1),
      ("image", "fig two", 2), ("paragraph", "p2", 2)))
  }
}
