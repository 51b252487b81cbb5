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
      } else if (t.matches("^#{1,6}\\s.*")) { // ATX header
        flushPara()
        val level = t.takeWhile(_ == '#').length
        out += (("header", level, t, stripInline(t.dropWhile(_ == '#').trim)))
        i += 1
      } else if (t.matches("^(-{3,}|\\*{3,}|_{3,})$")) { // thematic break: skipped
        flushPara(); i += 1 // (MarkdownReader.cs:104-109 skips breaks too)
      } else if (t.startsWith("|") && i + 1 < lines.length &&
                 lines(i + 1).trim.matches("^\\|?[\\s:|-]+\\|?$") &&
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
      } else if (t.matches("^!\\[[^\\]]*\\]\\([^)]*\\)$")) { // standalone image
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
      } else if (t.matches("^([-*+]|\\d+[.)])\\s.*")) { // list block
        flushPara()
        // an ordered marker ends an unordered list and vice versa (CommonMark)
        val ordered = t.matches("^\\d+[.)]\\s.*")
        val marker = if (ordered) "^\\d+[.)]\\s.*" else "^[-*+]\\s.*"
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (i < lines.length && (lines(i).trim.matches(marker) ||
               (lines(i).startsWith("  ") && lines(i).trim.nonEmpty))) {
          buf += lines(i); i += 1
        }
        val mdBlock = buf.mkString("\n")
        out += (("list", 0, mdBlock,
          stripInline(buf.map(_.trim.replaceFirst("^([-*+]|\\d+[.)])\\s+", "")).mkString(" "))))
      } else {
        if (para.nonEmpty) para.append(' ')
        para.append(t)
        i += 1
      }
    }
    flushPara()
    out.toSeq
  }

  /** Strip inline markdown (emphasis, links, images, code spans). */
  def stripInline(s: String): String =
    s.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
      .replaceAll("\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
      .replaceAll("`([^`]*)`", "$1")
      .replaceAll("\\*\\*([^*]+)\\*\\*", "$1")
      .replaceAll("__([^_]+)__", "$1")
      .replaceAll("\\*([^*]+)\\*", "$1")
      .replaceAll("(?<![A-Za-z0-9])_([^_]+)_(?![A-Za-z0-9])", "$1")
      .trim

  /** documents(doc_id, text) → Dataset[DocElement], one row per block. */
  def elements(spark: SparkSession, documents: DataFrame,
               idCol: String = "doc_id", textCol: String = "text"): Dataset[DocElement] = {
    import spark.implicits._
    documents
      .select(idCol, textCol)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        parseBlocks(Option(text).getOrElse("")).zipWithIndex.map {
          case ((kind, level, md, txt), seq) =>
            DocElement(id, seq, kind, level, md, txt)
        }
      }
  }
}
