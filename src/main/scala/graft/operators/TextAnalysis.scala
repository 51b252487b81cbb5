package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token
  * counting, language ID, quality scoring, fingerprinting. All pure
  * column expressions — map-only at any scale, and each has a DuckDB
  * twin so the driver oracle verifies values exactly.
  */
object TextAnalysis {

  /** Whitespace token count (native one-pass scan). */
  def tokenCount(text: Column): Column = graft.functions.native.tokenCount(text)

  /** BPE-ish token count: alphanumeric runs + individual
    * punctuation/symbol characters — approximates BPE piece counts
    * without engine-specific regex features (no lookarounds: the
    * DuckDB oracle's RE2 has none).
    */
  def regexTokenCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > 0)) +
      length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Deliberately small + deterministic.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "de", "que")
  )

  /** Language ID: count stopword hits per language; highest count wins
    * (ties: alphabetical language code), "und" (undetermined) when no
    * stopword appears.
    */
  def langId(text: Column, stopwords: Map[String, Seq[String]] = Stopwords): Column =
    graft.functions.native.bestLabel(text, stopwords.toSeq, fallback = "und")

  /** Quality score in [0,100]: rewards mid-length docs, penalizes
    * punctuation/symbol density, rewards (any-language) stopword
    * presence. Integer arithmetic where possible so Spark and DuckDB
    * agree bit-for-bit.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
    val allStop = Stopwords.values.flatten.toSeq.distinct
    val stopHits = graft.functions.native.vocabHits(text, allStop).cast("double")
    val lengthScore = when(nTok >= 20 && nTok <= 5000, 40.0)
      .when(nTok > 0, 20.0).otherwise(0.0)
    val punctScore = when(nChars === 0, 0.0)
      .when(punct / nChars <= 0.1, 30.0)
      .when(punct / nChars <= 0.3, 15.0)
      .otherwise(0.0)
    val stopScore = when(nTok === 0, 0.0)
      .when(stopHits / nTok >= 0.05, 30.0)
      .when(stopHits > 0, 15.0)
      .otherwise(0.0)
    (lengthScore + punctScore + stopScore).cast("int")
  }

  /** Document fingerprint: portable polynomial rolling hash (see
    * TextFunctions.portableHash for the DuckDB twin).
    */
  def fingerprint(text: Column): Column = TextFunctions.fingerprint(text)

  /** C4-style cleaning: strip URLs and e-mail addresses, collapse
    * whitespace runs, trim. Pure regex column ops (codegen'd).
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://[^\\s]+", ""),
        "[^\\s]+@[^\\s]+\\.[^\\s]+", ""),
      "\\s+", " "))

  /** Gopher-style repetition signal: total vs distinct non-empty lines
    * (a doc dominated by repeated lines is boilerplate). Returns a
    * struct (n_lines, n_distinct_lines).
    */
  def lineStats(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
    struct(
      size(lines).as("n_lines"),
      size(array_distinct(lines)).as("n_distinct_lines")
    )
  }
}
