package graft

import graft.sources.HtmlElementReader
import org.apache.spark.sql.functions._

/** HtmlElementReader — HTML in, the SAME element stream the markdown
  * reader emits (the MarkItDownReader contract: html → markdown
  * elements). Structure expectations are ported from the reference's
  * MarkdownReader behaviors (header levels, Section flattening, footer
  * after a break, image alt text) applied to the HTML equivalents,
  * plus the tolerant-parsing cases a real crawl needs (unclosed tags,
  * stray closes, entities, script/style stripping).
  */
class HtmlReaderSpec extends SparkSpecBase {
  import spark.implicits._

  private def blocks(html: String) = HtmlElementReader.parseBlocks(html)

  test("headers and paragraphs in document order, head/script/style dropped") {
    val got = blocks(
      """<html><head><title>T</title><style>p{color:red}</style></head>
        |<body><h1>Title</h1><p>First para.</p>
        |<script>var x = "<p>not content</p>";</script>
        |<h2>Sub</h2><p>Second para.</p></body></html>""".stripMargin)
    assert(got.map(b => (b._1, b._2, b._4)) == Seq(
      ("header", 1, "Title"),
      ("paragraph", 0, "First para."),
      ("header", 2, "Sub"),
      ("paragraph", 0, "Second para.")))
    assert(got.head._3 == "# Title") // markdown rendering
  }

  test("unclosed <p> and <li> tags parse tolerantly (implicit close)") {
    val got = blocks("<p>one<p>two<ul><li>a<li>b</ul><p>three")
    assert(got.map(_._4) == Seq("one", "two", "a", "b", "three"))
    assert(got.map(_._1) == Seq("paragraph", "paragraph", "paragraph",
      "paragraph", "paragraph"))
  }

  test("entities decode (named, numeric, hex); unknown pass through") {
    val got = blocks("<p>a &amp; b &lt;tag&gt; &#65;&#x42; &nosuch; &copy;</p>")
    assert(got.head._4 == "a & b <tag> AB &nosuch; ©")
  }

  test("inline markup renders as markdown, text stays plain") {
    val got = blocks(
      """<p>see <a href="http://x.y/z">the docs</a> and <b>bold</b>,
        |<em>it</em>, <code>f(x)</code></p>""".stripMargin)
    assert(got.head._3 ==
      "see [the docs](http://x.y/z) and **bold**, *it*, `f(x)`")
    assert(got.head._4 == "see the docs and bold, it, f(x)")
  }

  test("table: colspan pads columns, rowspan reserves them downward") {
    val got = blocks(
      """<table><tr><th colspan="2">wide</th><th>h3</th></tr>
        |<tr><td rowspan="2">tall</td><td>b1</td><td>c1</td></tr>
        |<tr><td>b2</td><td>c2</td></tr></table>""".stripMargin)
    assert(got.size == 1)
    assert(got.head._3 ==
      "| wide |  | h3 |\n| --- | --- | --- |\n| tall | b1 | c1 |\n|  | b2 | c2 |",
      got.head._3)
    assert(got.head._4 == "wide h3 tall b1 c1 b2 c2", got.head._4)
  }

  test("table: pipe markdown, separator after first row, cell text joined") {
    val got = blocks(
      """<table><thead><tr><th>h1</th><th>h2</th></tr></thead>
        |<tbody><tr><td>a</td><td>b</td></tr>
        |<tr><td>c</td><td>d</td></tr></tbody></table>""".stripMargin)
    assert(got.size == 1)
    val (kind, _, md, text) = got.head
    assert(kind == "table")
    assert(md == "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c | d |")
    assert(text == "h1 h2 a b c d")
  }

  test("standalone image yields alt text; hr marks the next block a footer") {
    val got = blocks(
      """<p><img src="u.png" alt="a chart"/></p>
        |<hr/><p>page 3 of 9</p>""".stripMargin)
    assert(got == Seq(
      ("image", 0, "![a chart](u.png)", "a chart"),
      ("footer", 0, "page 3 of 9", "page 3 of 9")))
  }

  test("image first after <hr> is a footer (reference MapLeafBlock order)") {
    val got = blocks("""<hr/><p><img src="u.png" alt="logo"/></p>""")
    // footer text = alt, mirroring the markdown reader's stripInline
    assert(got == Seq(("footer", 0, "![logo](u.png)", "logo")))
  }

  test("<footer> container paragraphs emit as footer kind") {
    val got = blocks("<p>body</p><footer><p>fine print</p></footer>")
    assert(got == Seq(
      ("paragraph", 0, "body", "body"),
      ("footer", 0, "fine print", "fine print")))
  }

  test("blockquote and div flatten to children (Section semantics)") {
    val got = blocks(
      """<blockquote><h3>quoted head</h3><p>quoted para</p></blockquote>
        |<div><p>in div</p></div>""".stripMargin)
    assert(got.map(b => (b._1, b._2, b._4)) == Seq(
      ("header", 3, "quoted head"),
      ("paragraph", 0, "quoted para"),
      ("paragraph", 0, "in div")))
  }

  test("list items become one element each; image items stay images") {
    val got = blocks(
      """<ul><li>alpha</li><li><img src="i.png" alt="fig"/></li>
        |<li>beta <b>strong</b></li></ul>""".stripMargin)
    assert(got.map(b => (b._1, b._4)) == Seq(
      ("paragraph", "alpha"),
      ("image", "fig"),
      ("paragraph", "beta strong")))
  }

  test("nested lists flatten; ordered lists too") {
    val got = blocks(
      "<ol><li>one<ul><li>one-a</li><li>one-b</li></ul></li><li>two</li></ol>")
    assert(got.map(_._4) == Seq("one", "one-a", "one-b", "two"))
  }

  test("pre keeps verbatim body as code, whitespace preserved") {
    val got = blocks("<pre>def f(x):\n    return x &lt; 2</pre>")
    assert(got == Seq(("code", 0,
      "```\ndef f(x):\n    return x < 2\n```", "def f(x):\n    return x < 2")))
  }

  test("mixed inline content under body merges into one paragraph") {
    val got = blocks("plain text <b>bold</b> tail<p>next</p>")
    assert(got.map(_._4) == Seq("plain text bold tail", "next"))
  }

  test("img mid-run stays inline; img starting a block is standalone") {
    val inline = blocks("""<div>text <img src="u" alt="x"/> more</div>""")
    assert(inline.map(b => (b._1, b._4)) == Seq(("paragraph", "text x more")))
    val standalone = blocks("""<div><img src="u" alt="x"/></div>""")
    assert(standalone.map(b => (b._1, b._4)) == Seq(("image", "x")))
  }

  test("whitespace collapses per block (HTML semantics)") {
    val got = blocks("<p>a\n   b\t\tc</p>")
    assert(got.head._4 == "a b c")
  }

  test("stray close tags and '<' junk never throw; parse is deterministic (fuzz)") {
    val rnd = new scala.util.Random(7)
    val atoms = Seq("<p>", "</p>", "<div>", "</div>", "<h2>", "</h2>",
      "text & more", "<", ">", "<<>>", "<img src=x>", "</nope>", "<ul>",
      "<li>", "&#x41;", "&broken", "<table><tr><td>c", "<!-- c -->",
      "<script>x<y</script>", "\n\n", "<b>z", "<a href=u>l</a>", "<hr>",
      "<pre>p</pre>", "<blockquote>", "<p / x>", "<a href=>", "<b =v>")
    for (_ <- 0 until 300) {
      val doc = Seq.fill(rnd.nextInt(30))(atoms(rnd.nextInt(atoms.size))).mkString
      val a = blocks(doc); val b = blocks(doc)
      assert(a == b)
    }
  }

  test("void tags run implicit close: <hr> pops an open <p> (browser semantics)") {
    // r7 advice: voids used to bypass the ImplicitClose loop, nesting
    // the <hr> inside the unclosed <p> and silently losing the
    // hr-marks-next-block-as-footer idiom on crawl HTML
    assert(blocks("<p>a<hr><p>b").map(b => (b._1, b._4)) ==
      Seq(("paragraph", "a"), ("footer", "b")))
    // self-closing form and an img-after-hr agree
    assert(blocks("<p>a<hr/><img src=x alt=y>").map(b => (b._1, b._4)) ==
      Seq(("paragraph", "a"), ("footer", "y")))
    // a void that does NOT implicitly close (img inside p) stays inline
    assert(blocks("<p>a <img src=x alt=y> b</p>").map(_._4) == Seq("a y b"))
  }

  test("pathological nesting is depth-capped: no StackOverflowError, content kept") {
    // r7 verdict item 3: 100k unclosed <div>s (ImplicitClose covers
    // p/li/tr, div/section nest freely) must parse, not throw from
    // unbounded parse/walk/inline recursion
    val deepOpen = "<div>" * 100000 + "<p>survivor</p>"
    assert(blocks(deepOpen).map(_._4) == Seq("survivor"))
    // balanced deep nesting too (exercises the close-tag pop path)
    val balanced = "<div>" * 50000 + "<p>mid</p>" + "</div>" * 50000
    assert(blocks(balanced).map(_._4) == Seq("mid"))
    // deep INLINE nesting (b is not a block: exercises inlineMd/Text)
    val inline = "<p>" + "<b>" * 50000 + "x"
    assert(blocks(inline).map(_._1) == Seq("paragraph"))
    assert(blocks(inline).head._4 == "x")
    // determinism under the cap
    assert(blocks(deepOpen) == blocks(deepOpen))
  }

  test("over-deep balanced spike keeps post-spike siblings at the right level") {
    // r8 advice: past MaxDepth an open is appended but not pushed; its
    // close must be swallowed by the skipped-ledger, not matched
    // against a real same-named ancestor. With the old pop-to-match,
    // the spike's excess </div>s popped the footer and outer div, so
    // "after" lost its footer context (and anything between the spike
    // and the next real div ancestor re-parented near the root)
    val spiked = "<body><div><footer>" +
      "<div>" * 300 + "deep" + "</div>" * 300 +
      "<p>after</p></footer></div></body>"
    val got = blocks(spiked)
    assert(got.exists(b => b._1 == "footer" && b._4 == "after"),
      got.map(b => (b._1, b._4)).mkString("; "))
    // the over-deep text is kept (flatten, not drop)
    assert(got.exists(_._4.contains("deep")))
  }

  test("over-cap close arriving AFTER an intervening real close is swallowed") {
    // r9 verdict item 6: the old ledger was WIPED on any matched real
    // close, so an unpushed open whose close arrived after an
    // intervening real-sibling close could pop a genuine same-named
    // ancestor. Construct: real <footer> ancestor, 255 <div>s to reach
    // the 256 cap, an UNPUSHED <footer> at the cap, a real </div>
    // (retires the unpushed open), then the late </footer> — which
    // must be swallowed by the pending-close ledger, NOT pop the real
    // footer ancestor. Observable: "after" keeps its footer context.
    val html = "<footer>" + "<div>" * 255 + "<footer>deep" +
      "</div>" + "</footer>" + "<p>after</p>"
    val got = blocks(html)
    assert(got.exists(b => b._1 == "footer" && b._4 == "after"),
      got.map(b => (b._1, b._4)).mkString("; "))
    assert(got.exists(_._4.contains("deep")))
    // nested unpushed opens whose OUTER close arrives first: the inner
    // unclosed opens retire too — the late </footer> here belongs to
    // the UNPUSHED inner footer (discarded wholesale by the old
    // dropWhile), not to the real footer ancestor
    val html2 = "<footer>" + "<div>" * 255 +
      "<section><footer>deeper</section>" + // inner footer never closed
      "</div>" + "</footer>" + "<p>tail</p>"
    val got2 = blocks(html2)
    assert(got2.exists(b => b._1 == "footer" && b._4 == "tail"),
      got2.map(b => (b._1, b._4)).mkString("; "))
  }

  test("retired over-cap open does not shadow a NEWER real element's close") {
    // r10 review finding: a retired unpushed <table>'s pending close
    // must NOT swallow the close of a table opened AFTER the retire —
    // innermost-match means the newest same-named open wins. If the
    // newer table's close were swallowed, the trailing <p> would parse
    // INSIDE the still-open table and its text would be dropped by the
    // table renderer (observable content loss).
    val html = "<div>" * 256 +
      "<table>" + // unpushed at the cap
      "</div></div></div>" + // pops 3 divs, retires the virtual table
      "<table><tr><td>cell</td></tr></table>" + // real, newer
      "<p>after</p>"
    val got = blocks(html)
    assert(got.exists(b => b._1 == "table" && b._4 == "cell"),
      got.map(b => (b._1, b._4)).mkString("; "))
    assert(got.exists(b => b._1 == "paragraph" && b._4 == "after"),
      got.map(b => (b._1, b._4)).mkString("; "))
    // and the r9 scenario still holds: a late close for a retired
    // open with NO newer same-named real element is swallowed, not
    // matched against a genuine ancestor (covered in the over-cap
    // swallow test above — both semantics coexist via open stamps)
  }

  test("table: ragged row shorter than a carried rowspan column stays aligned") {
    // r9 advice: claimCarried stopped at the first gap, so a carry at
    // a column beyond a short row was never decremented and the
    // reservation slipped down a row, misaligning every later row
    val got = blocks(
      """<table><tr><td>a1</td><td>b1</td><td rowspan="2">c1</td></tr>
        |<tr><td>a2</td></tr>
        |<tr><td>a3</td><td>b3</td><td>c3</td></tr></table>""".stripMargin)
    assert(got.size == 1)
    assert(got.head._3 ==
      "| a1 | b1 | c1 |\n| --- | --- | --- |\n| a2 |  |  |\n| a3 | b3 | c3 |",
      got.head._3)
    assert(got.head._4 == "a1 b1 c1 a2 a3 b3 c3", got.head._4)
  }

  test("empty and null-ish inputs") {
    assert(blocks("").isEmpty)
    assert(blocks("   \n  ").isEmpty)
    assert(blocks("<html><body></body></html>").isEmpty)
  }

  test("elements: pageCol and metaCols propagate; pipeline is reader-agnostic") {
    val docs = Seq(
      (1L, "<h1>A</h1><p>body text</p>", 3, "web"),
      (2L, "<p>only para</p>", 5, "crawl")
    ).toDF("doc_id", "html", "page", "src")
    val got = HtmlElementReader.elements(spark, docs,
        pageCol = Some("page"), metaCols = Seq("src"))
      .collect().sortBy(e => (e.doc_id, e.seq))
    assert(got.map(e => (e.doc_id, e.seq, e.kind, e.text)).toSeq == Seq(
      (1L, 0, "header", "A"), (1L, 1, "paragraph", "body text"),
      (2L, 0, "paragraph", "only para")))
    assert(got.forall(e => e.page_number.isDefined && e.metadata.contains("src")))
    // the element stream feeds the SAME downstream ops as markdown
    val elems = HtmlElementReader.elements(spark, docs,
      pageCol = Some("page"), metaCols = Seq("src")).toDF()
    val processed = graft.operators.Processors.removeEmpty(
      graft.operators.Processors.removeFooters(elems))
    assert(processed.count() == 3)
  }
}
