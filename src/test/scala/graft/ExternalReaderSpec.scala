package graft

import graft.sources.{ExternalReader, MarkdownElementReader}
import org.apache.spark.sql.functions._

class ExternalReaderSpec extends SparkSpecBase {
  import spark.implicits._

  test("external conversion: bytes → documents → elements; failures isolated per row") {
    val files = Seq(
      (1L, "# Title\n\nbody".getBytes("UTF-8"), "application/pdf", "a.pdf"),
      (2L, "plain text".getBytes("UTF-8"), "text/plain", "b.txt")
    ).toDF("file_id", "content", "media_type", "source")
    val docs = ExternalReader.read(spark, files)
    assert(docs.where(col("error").isNotNull).count() == 0)
    val elems = MarkdownElementReader.elements(spark, docs).collect()
    assert(elems.exists(e => e.kind == "header" && e.text == "Title"))

    val failing = new ExternalReader.MarkdownConverter {
      def convert(content: Array[Byte], mediaType: String): String =
        if (mediaType == "application/pdf") throw new RuntimeException("no pdf engine")
        else new String(content, "UTF-8")
    }
    val mixed = ExternalReader.read(spark, files, failing).collect()
    val byId = mixed.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("error").contains("no pdf engine"))
    assert(byId(2L).getAs[String]("error") == null)
    assert(byId(2L).getAs[String]("text") == "plain text")
  }

  test("paged conversion: page provenance flows file → pages → elements → chunks") {
    import graft.operators.{Chunkers, ChunkerOptions}
    val files = Seq(
      (1L, "# P1\n\npage one body\fpage two body".getBytes("UTF-8"), "application/pdf", "a.pdf")
    ).toDF("file_id", "content", "media_type", "source")
    val pages = ExternalReader.readPaged(spark, files)
    assert(pages.count() == 2)
    val elems = MarkdownElementReader.elements(spark, pages,
      pageCol = Some("page"), metaCols = Seq("source"))
    val chunks = Chunkers.elementChunks(spark, elems, ChunkerOptions(maxTokens = 50, overlap = 0))
      .collect().sortBy(_.chunk_id)
    assert(chunks.length == 2)
    assert(chunks(0).page_number.contains(1) && chunks(0).content.contains("page one"))
    assert(chunks(1).page_number.contains(2) && chunks(1).content.contains("page two"))
    assert(chunks.forall(_.metadata == Map("source" -> "a.pdf")))
  }
}
