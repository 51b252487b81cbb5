package graft.model

/** Core row types of the graft engine.
  *
  * The reference (Microsoft.Extensions.DataIngestion,
  * src/Microsoft.Extensions.DataIngestion.Abstractions/IngestionDocument.cs)
  * models a document as a tree of sections/elements that is only ever
  * walked in document order (`EnumerateContent`). graft flattens that
  * tree into rows so that a billion documents become a DataFrame and
  * every pipeline stage is a narrow, distributed transform.
  */

/** One structural element of a parsed document.
  *
  * Mirrors IngestionDocumentElement subtypes (IngestionDocument.cs:118+):
  * kind ∈ header|paragraph|table|image|footer|code|quote|list.
  * `level` is the header level (0 for non-headers), `seq` preserves
  * document order (the reference walks its tree depth-first; `seq` is
  * that walk's index). `page_number` mirrors
  * IngestionDocumentElement.PageNumber (IngestionDocument.cs:106) —
  * None for sources without pages (plain markdown); paged readers
  * (the reference's DocumentIntelligence/LlamaParse twins) set it.
  * `metadata` mirrors the per-element metadata dictionary
  * (IngestionDocument.cs:116), string-valued for a stable column type.
  */
final case class DocElement(
    doc_id: Long,
    seq: Int,
    kind: String,
    level: Int,
    markdown: String,
    text: String,
    page_number: Option[Int] = None,
    metadata: Map[String, String] = Map.empty
)

/** A chunk produced by any chunker.
  *
  * Mirrors IngestionChunk<string> (Abstractions/IngestionChunk.cs):
  * content + context + back-reference to the document; `token_count`
  * is first-class because every chunker enforces a token budget.
  */
final case class Chunk(
    doc_id: Long,
    chunk_id: Int,
    content: String,
    context: String,
    token_count: Int,
    page_number: Option[Int] = None,
    metadata: Map[String, String] = Map.empty
)

/** Vector-store record, the writer's output row.
  * Column names follow Writers/VectorStoreWriter.cs:15-20 (lowercase,
  * no special characters, for maximum store compatibility).
  */
final case class VectorRecord(
    key: String,
    embedding: Array[Float],
    content: String,
    context: String,
    documentid: String
)
