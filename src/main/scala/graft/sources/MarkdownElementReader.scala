package graft.sources

import graft.model.DocElement
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Markdown → structural elements, the Spark twin of the reference's
  * MarkdownReader (src/Microsoft.Extensions.DataIngestion.Markdown/
  * MarkdownReader.cs), which parses with Markdig and maps blocks to
  * IngestionDocumentElement rows.
  *
  * graft parses inside a typed flatMap: one document row in, N element
  * rows out — a narrow transform with no shuffle, so parsing 100 TB of
  * markdown is a map-only stage bounded by scan IO. A hand-rolled
  * line-based block parser replaces Markdig (headers, fenced code,
  * pipe tables, block quotes, lists, images, thematic breaks,
  * paragraphs — the block types MarkdownReader.cs:128-146 maps).
  */
object MarkdownElementReader {

  // Precompiled block-shape patterns: String.matches would recompile
  // its regex on EVERY line of EVERY document — at 100 TB that is the
  // parse loop's entire budget.
  private val AtxHeader = java.util.regex.Pattern.compile("^#{1,6}\\s.*")
  private val ThematicBreak = java.util.regex.Pattern.compile("^(-{3,}|\\*{3,}|_{3,})$")
  private val TableSeparator = java.util.regex.Pattern.compile("^\\|?[\\s:|-]+\\|?$")
  private val StandaloneImage = java.util.regex.Pattern.compile("^!\\[[^\\]]*\\]\\([^)]*\\)$")
  private val ListItem = java.util.regex.Pattern.compile("^([-*+]|\\d+[.)])\\s.*")
  private val OrderedItem = java.util.regex.Pattern.compile("^\\d+[.)]\\s.*")
  private val UnorderedItem = java.util.regex.Pattern.compile("^[-*+]\\s.*")
  private val ListMarkerPrefix = java.util.regex.Pattern.compile("^([-*+]|\\d+[.)])\\s+")

  private def matches(p: java.util.regex.Pattern, s: String): Boolean =
    p.matcher(s).matches()

  /** Parse one markdown body into ordered (kind, level, markdown, text). */
  def parseBlocks(md: String): Seq[(String, Int, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String, String)]
    val lines = md.split("\n", -1)
    var i = 0
    val para = new StringBuilder

    def flushPara(): Unit = {
      val p = para.toString.trim
      if (p.nonEmpty) out += (("paragraph", 0, p, stripInline(p)))
      para.clear()
    }

    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (t.isEmpty) { flushPara(); i += 1 }
      else if (t.startsWith("```")) { // fenced code block
        flushPara()
        val buf = new StringBuilder(line)
        i += 1
        var closed = false
        while (i < lines.length && !closed) {
          buf.append('\n').append(lines(i))
          if (lines(i).trim.startsWith("```")) closed = true
          i += 1
        }
        val mdBlock = buf.toString
        val body = mdBlock.split("\n").drop(1).dropRight(if (closed) 1 else 0).mkString("\n")
        out += (("code", 0, mdBlock, body))
      } else if (matches(AtxHeader, t)) { // ATX header
        flushPara()
        val level = t.takeWhile(_ == '#').length
        out += (("header", level, t, stripInline(t.dropWhile(_ == '#').trim)))
        i += 1
      } else if (matches(ThematicBreak, t)) { // thematic break: skipped
        flushPara(); i += 1 // (MarkdownReader.cs:104-109 skips breaks too)
      } else if (t.startsWith("|") && i + 1 < lines.length &&
                 matches(TableSeparator, lines(i + 1).trim) &&
                 lines(i + 1).contains("-")) { // pipe table
        flushPara()
        val buf = scala.collection.mutable.ArrayBuffer(line)
        i += 1
        while (i < lines.length && lines(i).trim.startsWith("|")) {
          buf += lines(i); i += 1
        }
        val mdBlock = buf.mkString("\n")
        val cellText = buf.zipWithIndex
          .filter(_._2 != 1) // drop separator row
          .map(_._1)
          .flatMap(_.split("\\|").map(_.trim).filter(_.nonEmpty))
          .mkString(" ")
        out += (("table", 0, mdBlock, stripInline(cellText)))
      } else if (matches(StandaloneImage, t)) { // standalone image
        flushPara()
        val alt = t.substring(2, t.indexOf(']'))
        out += (("image", 0, t, alt))
        i += 1
      } else if (t.startsWith(">")) { // block quote
        flushPara()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (i < lines.length && lines(i).trim.startsWith(">")) {
          buf += lines(i); i += 1
        }
        val mdBlock = buf.mkString("\n")
        out += (("quote", 0, mdBlock, stripInline(buf.map(_.trim.stripPrefix(">").trim).mkString(" "))))
      } else if (matches(ListItem, t)) { // list block
        flushPara()
        // an ordered marker ends an unordered list and vice versa (CommonMark)
        val ordered = matches(OrderedItem, t)
        val marker = if (ordered) OrderedItem else UnorderedItem
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (i < lines.length && (matches(marker, lines(i).trim) ||
               (lines(i).startsWith("  ") && lines(i).trim.nonEmpty))) {
          buf += lines(i); i += 1
        }
        val mdBlock = buf.mkString("\n")
        out += (("list", 0, mdBlock,
          stripInline(buf.map(l => ListMarkerPrefix.matcher(l.trim).replaceFirst("")).mkString(" "))))
      } else {
        if (para.nonEmpty) para.append(' ')
        para.append(t)
        i += 1
      }
    }
    flushPara()
    out.toSeq
  }

  // Inline-markdown strippers, precompiled and applied in order.
  private val InlinePatterns: Array[java.util.regex.Pattern] = Array(
    "!\\[([^\\]]*)\\]\\([^)]*\\)",
    "\\[([^\\]]*)\\]\\([^)]*\\)",
    "`([^`]*)`",
    "\\*\\*([^*]+)\\*\\*",
    "__([^_]+)__",
    "\\*([^*]+)\\*",
    "(?<![A-Za-z0-9])_([^_]+)_(?![A-Za-z0-9])"
  ).map(java.util.regex.Pattern.compile)
  // first char a match of InlinePatterns(i) must contain — most text
  // has no inline markup, so an indexOf miss skips the matcher
  private val InlineTriggers = Array('!', '[', '`', '*', '_', '*', '_')

  /** Strip inline markdown (emphasis, links, images, code spans). */
  def stripInline(s: String): String = {
    var cur = s
    var i = 0
    while (i < InlinePatterns.length) {
      if (cur.indexOf(InlineTriggers(i)) >= 0)
        cur = InlinePatterns(i).matcher(cur).replaceAll("$1")
      i += 1
    }
    cur.trim
  }

  /** documents(doc_id, text) → Dataset[DocElement], one row per block.
    *
    * Paged inputs (one row per page, like the reference's
    * DocumentIntelligence/LlamaParse readers that set
    * IngestionDocumentElement.PageNumber — IngestionDocument.cs:106)
    * pass `pageCol`: every parsed element inherits that row's page.
    * `metaCols` names document columns copied into every element's
    * metadata map (provenance that must survive chunking at scale).
    * Plain markdown has neither → None / empty map.
    */
  def elements(spark: SparkSession, documents: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               pageCol: Option[String] = None,
               metaCols: Seq[String] = Nil): Dataset[DocElement] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val metaNames = metaCols // stable copy captured by the closure
    val projected = documents.select(
      Seq(col(idCol).cast("long"), col(textCol).cast("string")) ++
        pageCol.map(c => col(c).cast("int")).toSeq ++
        metaNames.map(c => col(c).cast("string")): _*)
    val hasPage = pageCol.isDefined
    val metaOffset = if (hasPage) 3 else 2
    projected.flatMap { row =>
      val id = row.getLong(0)
      val text = if (row.isNullAt(1)) "" else row.getString(1)
      val page = if (hasPage && !row.isNullAt(2)) Some(row.getInt(2)) else None
      val meta = metaNames.zipWithIndex.collect {
        case (name, i) if !row.isNullAt(metaOffset + i) => name -> row.getString(metaOffset + i)
      }.toMap
      parseBlocks(text).zipWithIndex.map {
        case ((kind, level, md, txt), seq) =>
          DocElement(id, seq, kind, level, md, txt, page, meta)
      }
    }
  }
}
