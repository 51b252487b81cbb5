package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text ranked retrieval over the corpus (Robertson et al.,
  * "Okapi at TREC-3" — the BM25 family), the lexical twin of
  * [[Similarity]]'s vector search: score = Σ_t idf(t) · tf-saturation,
  * idf = ln(1 + (N − df + ½)/(df + ½)) (the Lucene non-negative
  * variant).
  *
  * Scale posture: ONE corpus tokenize pass builds the postings table
  * (doc_id, dl, term, tf) — a single map-side-combined shuffle on
  * (doc_id, term); everything downstream is pruned by the QUERY terms,
  * which broadcast (a query set is KBs — the per-term df aggregate,
  * the idf join, and the scoring join all hang off that broadcast, so
  * corpus postings never shuffle again until the pairs-bounded
  * (query_id, doc_id) score sum). Postings are materialized once
  * (localCheckpoint) because both the df aggregate and the scoring
  * join consume them — the same single-materialization trade as
  * [[Dedup.minhashLshPairs]]'s signature table. On a real cluster the
  * postings table is the thing you'd persist/bucket by term once and
  * reuse across query batches.
  */
object Retrieval {

  /** Lowercased whitespace tokens — the corpus-wide tokenization every
    * text operator here shares (TextFunctions.tokens' split).
    */
  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Postings with per-doc length riding along: (doc_id, dl, term,
    * tf). dl rides from the tokenize select so no second corpus
    * aggregate is needed for document length.
    */
  private[operators] def postings(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("dl"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k tf-idf keywords per document — corpus-statistical keyword
    * extraction (no predefined vocabulary, unlike the reference's
    * KeywordEnricher): score = tf · ln(N/df), rank per document over
    * the 6-dp-rounded score, ties to the lexicographically first
    * term. The score is a single product of deterministic doubles (no
    * accumulation), so rounding alone makes the rank engine-stable.
    *
    * Scale shape: one postings pass (the same map-side-combined
    * (doc_id, term) aggregate as [[bm25Search]], materialized once for
    * its two consumers); the df aggregate combines to ≤|vocab| rows
    * and AQE broadcasts it into the scoring join when it fits. The
    * only exchanges carrying the term string are the postings build
    * and the per-document top-k — the term IS the output payload
    * there, unlike the LM-scoring family where hashes suffice.
    */
  def tfidfKeywords(documents: DataFrame, k: Int = 5): DataFrame = {
    val nDocs = documents.agg(count(lit(1))).head().getLong(0)
    val post = postings(documents).localCheckpoint(true)
    val dfs = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    post.join(dfs, Seq("term"))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Reciprocal-rank fusion (Cormack et al., "Reciprocal Rank Fusion
    * outperforms Condorcet and individual rank learning methods") of
    * two ranked lists — the standard hybrid-search combiner fusing a
    * lexical ([[bm25Search]]) and a vector
    * ([[Similarity.knnBruteForceBatch]]/knnIvf) ranking:
    * rrf = Σ_sources 1/(rrfK + rank). Inputs are (query_id, doc_id,
    * rank) with rank from each source's own top-k; a document absent
    * from one source contributes 0 for it.
    *
    * Both inputs are top-k-bounded per query, so the fusion join is
    * queries × ≤2k rows — negligible next to the upstream retrieval;
    * the full-outer join and the final window both hang off the same
    * (query_id, doc_id)-sized data. The rrf terms are exact rationals
    * in doubles and the two-term sum has a fixed association, so the
    * score is bit-deterministic across engines — no rounding needed.
    */
  def rrfFuse(lexical: DataFrame, vector: DataFrame, k: Int = 10,
              rrfK: Int = 60): DataFrame = {
    val a = lexical.select(col("query_id"), col("doc_id"), col("rank").as("rank_lex"))
    val b = vector.select(col("query_id"), col("doc_id"), col("rank").as("rank_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_vec")), lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
  }

  /** Top-k BM25 documents per query. `documents` = (doc_id, text),
    * `queries` = (query_id, text); each query scores by its DISTINCT
    * terms (standard bag-of-words BM25, no query-term multiplicity).
    *
    * Ranking is over the score rounded to 6 decimals (ties → lowest
    * doc_id): the per-document score is a sum of per-term doubles
    * whose association order is engine- and partition-dependent, so
    * ranking raw doubles would make equal-text documents order
    * nondeterministically. Rounding collapses the last-bit noise
    * before the rank, which makes the output reproducible across runs
    * AND engines — same reason the ANN family rounds `cos` in its
    * driver projections.
    */
  def bm25Search(documents: DataFrame, queries: DataFrame, k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // two scalars to the driver (count + mean doc length), like
    // Similarity.sampleCentroids' count — the corpus never collects
    val stats = documents
      .select(size(toks(col("text"))).as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
      .head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)

    val post = postings(documents).localCheckpoint(true)

    val qterms = queries
      .select(col("query_id"), explode(toks(col("text"))).as("term"))
      .distinct()
    // df over the whole corpus, restricted to query terms: the
    // broadcast semi-join prunes the postings scan's aggregate to
    // ≤ |query vocabulary| rows (map-side combined)
    val dfs = post
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // (query_id, term, idf): still query-vocabulary-sized → broadcast
    val qidf = qterms.join(dfs, Seq("term"))
      .select(col("query_id"), col("term"),
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          .as("idf"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    post.join(broadcast(qidf), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
          .as("term_score"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("term_score")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
