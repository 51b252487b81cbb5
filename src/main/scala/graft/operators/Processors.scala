package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document/chunk processors — the reference's enrichers, re-expressed
  * as deterministic column transforms.
  *
  * The reference enrichers (Processors/SummaryEnricher.cs,
  * KeywordEnricher.cs, ClassificationEnricher.cs, SentimentEnricher.cs)
  * call an LLM per chunk and attach a metadata key. graft keeps the
  * exact contract — one new column per enricher, same key names
  * (`summary`, `keywords`, `classification`, `sentiment`) — but
  * computes hermetic, deterministic values (extractive summary, tf
  * keywords, vocabulary classification, lexicon sentiment) so the
  * pipeline runs with zero external calls at any scale. An LLM-backed
  * variant plugs in by swapping the column expression for a
  * mapInPandas/foreachBatch call — the pipeline shape is unchanged.
  */
object Processors {

  /** RemovalProcessor.cs: drop elements matching a predicate; the two
    * canned predicates are footers and empty sections.
    */
  def removeElements(elements: DataFrame, shouldRemove: Column): DataFrame =
    elements.where(!shouldRemove)

  def removeFooters(elements: DataFrame): DataFrame =
    removeElements(elements, col("kind") === "footer")

  def removeEmpty(elements: DataFrame): DataFrame =
    removeElements(elements, length(trim(col("text"))) === 0)

  /** SummaryEnricher (metadata key "summary", maxWordCount default 100
    * — SummaryEnricher.cs:36): extractive summary = first maxWords
    * whitespace tokens.
    */
  def withSummary(df: DataFrame, textCol: String = "content", maxWords: Int = 100): DataFrame =
    df.withColumn(
      "summary",
      array_join(slice(TextFunctions.tokens(col(textCol)), 1, maxWords), " ")
    )

  /** KeywordEnricher (key "keywords", maxKeywords default 5 —
    * KeywordEnricher.cs:38): top-k terms from a predefined vocabulary,
    * by in-document frequency, ties broken alphabetically. Returns an
    * array<string> column like the reference's string[].
    */
  def withKeywords(df: DataFrame, vocabulary: Seq[String],
                   textCol: String = "content", maxKeywords: Int = 5): DataFrame =
    df.withColumn(
      "keywords",
      graft.functions.native.keywordsTopK(col(textCol), vocabulary, maxKeywords)
    )

  /** ClassificationEnricher (key "classification", fallback "Unknown" —
    * ClassificationEnricher.cs:37): each class is defined by trigger
    * words; the class with the highest hit count wins (ties:
    * alphabetical class name), fallback when nothing matches.
    */
  def withClassification(df: DataFrame, classes: Map[String, Seq[String]],
                         textCol: String = "content",
                         fallback: String = "Unknown"): DataFrame =
    df.withColumn(
      "classification",
      graft.functions.native.bestLabel(
        col(textCol),
        classes.toSeq.map { case (name, words) => (name, words.map(_.toLowerCase)) },
        fallback)
    )

  /** Default sentiment lexica (small, deterministic). */
  val PositiveWords: Seq[String] = Seq(
    "good", "great", "excellent", "fast", "love", "best", "happy",
    "win", "positive", "improve", "success", "easy", "clean", "nice"
  )
  val NegativeWords: Seq[String] = Seq(
    "bad", "slow", "terrible", "worst", "hate", "fail", "negative",
    "bug", "broken", "hard", "dirty", "poor", "wrong", "error"
  )

  /** SentimentEnricher (key "sentiment", values Positive/Negative/
    * Neutral/Unknown — SentimentEnricher.cs:17): lexicon polarity.
    * Unknown when no lexicon word appears (the reference's
    * below-confidence case); else sign of (pos - neg).
    */
  def withSentiment(df: DataFrame, textCol: String = "content",
                    positive: Seq[String] = PositiveWords,
                    negative: Seq[String] = NegativeWords): DataFrame = {
    val pos = graft.functions.native.vocabHits(col(textCol), positive.map(_.toLowerCase))
    val neg = graft.functions.native.vocabHits(col(textCol), negative.map(_.toLowerCase))
    df.withColumn(
      "sentiment",
      when(pos + neg === 0, "Unknown")
        .when(pos > neg, "Positive")
        .when(neg > pos, "Negative")
        .otherwise("Neutral")
    )
  }

  /** Quality gate: keep documents scoring at least `minScore` on the
    * TextAnalysis quality heuristic — the standard pre-chunking filter
    * in a training-data pipeline. Narrow (pushdown-friendly) predicate.
    */
  def filterByQuality(df: DataFrame, minScore: Int, textCol: String = "text"): DataFrame =
    df.where(TextAnalysis.qualityScore(col(textCol)) >= minScore)

  /** Language gate: keep documents whose predicted language is in
    * `langs` (stopword-heuristic language ID).
    */
  def filterByLanguage(df: DataFrame, langs: Seq[String], textCol: String = "text"): DataFrame =
    df.where(TextAnalysis.langId(col(textCol)).isin(langs: _*))

  /** Fold enricher output columns into the chunk `metadata` map — the
    * reference writes each enricher's result at
    * chunk.Metadata[MetadataKey] (SummaryEnricher.cs:61,
    * KeywordEnricher.cs:64, ClassificationEnricher.cs:61,
    * SentimentEnricher.cs:60); graft keeps the flat columns for
    * Catalyst pruning AND offers the map form for stores that persist
    * chunk metadata as one field. Missing columns are skipped; array
    * columns (keywords) are comma-joined.
    */
  def enrichmentsToMetadata(df: DataFrame,
      keys: Seq[String] = Seq("summary", "keywords", "classification", "sentiment")): DataFrame = {
    val present = keys.filter(df.columns.contains)
    val pairs = present.flatMap { k =>
      val v =
        if (df.schema(k).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
          array_join(col(k), ",")
        else col(k).cast("string")
      Seq(lit(k), v)
    }
    if (pairs.isEmpty) df
    else {
      val m = map(pairs: _*)
      if (df.columns.contains("metadata"))
        // last-wins overwrite like the reference's
        // chunk.Metadata[key] = value: drop colliding keys from the
        // existing map first — bare map_concat THROWS on duplicate
        // keys under the default spark.sql.mapKeyDedupPolicy
        df.withColumn("metadata", map_concat(
          map_filter(coalesce(col("metadata"), map()),
            (k, _) => !k.isInCollection(present)), m))
      else df.withColumn("metadata", m)
    }
  }

  /** ImageAlternativeTextEnricher.cs: fills AlternativeText for image
    * elements. Hermetic stand-in: derive alt text from the image
    * markdown's existing alt + a deterministic caption tag. A real
    * vision model plugs in via mapInPandas over the binary column.
    */
  def withImageAltText(elements: DataFrame): DataFrame =
    elements.withColumn(
      "text",
      when(
        col("kind") === "image" and length(col("text")) === 0,
        concat(lit("image:"), regexp_extract(col("markdown"), "\\(([^)]*)\\)", 1))
      ).otherwise(col("text"))
    )
}
