package graft.sources

import graft.model.DocElement
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Format-sniffing reader router: one ingest entry point for a mixed
  * corpus of markdown / HTML / DOCX / PDF binaries, dispatching each
  * row to the matching in-process reader by magic bytes. The
  * reference wires exactly one IngestionDocumentReader per pipeline
  * (DataIngestionPipeline ctor takes a single reader;
  * MarkItDownReader.cs covers many formats precisely so the pipeline
  * doesn't have to care) — in a crawl-scale corpus the format is a
  * per-ROW property, so the router is the Spark-native form of the
  * same idea: a single `elements()` call over a binary column,
  * format detection and parsing fused into one typed flatMap —
  * map-only, no shuffle, at any corpus size.
  *
  * Detection (first bytes, after whitespace where textual):
  *   - `%PDF-`            → [[PdfElementReader]]
  *   - `PK`   → zip container → [[DocxElementReader]]
  *     (a zip without word/document.xml degrades to empty there —
  *     the same contract as a corrupt DOCX)
  *   - leading `<`        → [[HtmlElementReader]] (covers `<!DOCTYPE`,
  *     `<html`, fragments)
  *   - anything else      → [[MarkdownElementReader]] (UTF-8 text)
  *
  * Every reader emits the same (kind, level, markdown, text) stream,
  * so a mixed corpus yields ONE uniform element table — the
  * reader-agnostic claim made structural (the i_auto_elements driver
  * row proves all four readers emit identical canonical rows for the
  * same logical document).
  */
object AutoElementReader {

  /** Sniff the source format from leading bytes. */
  def detect(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return "markdown"
    // zip magic at offset 0 is decisive (checked FIRST: a DOCX's
    // compressed payload can coincidentally contain "%PDF-" in its
    // first KB, and no real PDF starts with a local-file header)
    if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4) return "docx"
    // %PDF- anywhere in the first 1024 bytes, not just offset 0: the
    // PDF spec (ISO 32000-1 §7.5.2 note; Acrobat's documented
    // tolerance) allows junk before the header, and real crawl files
    // use it — a strict offset-0 match routed such files to the
    // markdown reader, emitting binary garbage as text elements
    // instead of parsing (or cleanly degrading) as PDF
    val scan = math.min(bytes.length - 4, 1024)
    var p = 0
    while (p < scan) {
      if (bytes(p) == '%' && bytes(p + 1) == 'P' && bytes(p + 2) == 'D' &&
        bytes(p + 3) == 'F' && bytes(p + 4) == '-') return "pdf"
      p += 1
    }
    // textual: skip UTF-8 BOM and whitespace, look for a tag open
    var i = 0
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
      (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) i = 3
    while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n' ||
      bytes(i) == '\r' || bytes(i) == '\t')) i += 1
    if (i < bytes.length && bytes(i) == '<') "html" else "markdown"
  }

  /** Parse one binary into the shared element tuple stream (page is
    * None for the pageless formats, the PDF page number otherwise). */
  def parseBlocks(
      bytes: Array[Byte]): Seq[(String, Int, String, String, Option[Int])] =
    detect(bytes) match {
      case "pdf" =>
        PdfElementReader.parseBlocks(bytes).map {
          case (k, l, m, t, p) => (k, l, m, t, Some(p))
        }
      case "docx" =>
        DocxElementReader.parseBlocks(bytes).map {
          case (k, l, m, t) => (k, l, m, t, None)
        }
      case "html" =>
        HtmlElementReader.parseBlocks(
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)).map {
          case (k, l, m, t) => (k, l, m, t, None)
        }
      case _ =>
        MarkdownElementReader.parseBlocks(
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)).map {
          case (k, l, m, t) => (k, l, m, t, None)
        }
    }

  /** One binary document → its ordered [[DocElement]]s (detected
    * format recorded in metadata under "format") — the per-row body of
    * [[elements]], shared with the fused streaming chunker
    * ([[graft.operators.Chunkers.autoElementChunks]]). */
  def docElements(id: Long, bytes: Array[Byte],
                  baseMeta: Map[String, String] = Map.empty): Seq[DocElement] = {
    val meta = baseMeta + ("format" -> detect(bytes))
    parseBlocks(bytes).zipWithIndex.map {
      case ((kind, level, md, txt, page), seq) =>
        DocElement(id, seq, kind, level, md, txt, page, meta)
    }
  }

  /** documents(doc_id, content: binary) → Dataset[DocElement] — the
    * shared reader contract over a MIXED-format corpus. The detected
    * format is recorded in each element's metadata under "format" so
    * downstream stages can filter/audit by source type. */
  def elements(spark: SparkSession, documents: DataFrame,
               idCol: String = "doc_id", contentCol: String = "content",
               metaCols: Seq[String] = Nil): Dataset[DocElement] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val metaNames = metaCols
    val projected = documents.select(
      Seq(col(idCol).cast("long"), col(contentCol).cast("binary")) ++
        metaNames.map(c => col(c).cast("string")): _*)
    projected.flatMap { row =>
      val id = row.getLong(0)
      val bytes =
        if (row.isNullAt(1)) Array.empty[Byte] else row.getAs[Array[Byte]](1)
      val meta = metaNames.zipWithIndex.collect {
        case (name, i) if !row.isNullAt(2 + i) => name -> row.getString(2 + i)
      }.toMap
      docElements(id, bytes, meta)
    }
  }
}
