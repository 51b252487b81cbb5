package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana"),
    (2L, "apple apple cherry"),
    (3L, "durian fig grape"),
    (4L, "apple banana") // exact dup of 1: rounded-score tie → id order
  ).toDF("doc_id", "text")

  test("bm25: tf saturation ranks the double-hit doc first; no-hit docs absent") {
    val q = Seq((0L, "apple")).toDF("query_id", "text")
    val got = Retrieval.bm25Search(docs, q, k = 10)
      .orderBy(col("rank"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    // d2 has tf=2 (saturated but still above tf=1); d1/d4 tie exactly
    // on the rounded score and break by doc_id; d3 never matches
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L))
    assert(got(1)._2 == got(2)._2)
    assert(got(0)._2 > got(1)._2)
  }

  test("bm25: hand-computed score for a one-term query") {
    val q = Seq((0L, "cherry")).toDF("query_id", "text")
    val got = Retrieval.bm25Search(docs, q, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(2L))
    // N=4 docs, df(cherry)=1, tf=1, dl=3, avgdl=10/4
    val idf = math.log(1.0 + (4.0 - 1 + 0.5) / (1 + 0.5))
    val expect = idf * (1 * 2.2) / (1 + 1.2 * (1.0 - 0.75 + 0.75 * 3 / 2.5))
    assert(math.abs(got.head._2 - expect) < 1e-6)
  }

  test("bm25: multi-term query sums per-term contributions; query terms distinct") {
    val q1 = Seq((0L, "apple banana")).toDF("query_id", "text")
    val q2 = Seq((0L, "apple banana apple")).toDF("query_id", "text")
    val s1 = Retrieval.bm25Search(docs, q1, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val s2 = Retrieval.bm25Search(docs, q2, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // bag-of-words over DISTINCT query terms: repeating a term is a no-op
    assert(s1 == s2)
    // the two-term docs outrank the apple-only doc
    val ranked = Retrieval.bm25Search(docs, q1, k = 10)
      .orderBy(col("rank")).select("doc_id").as[Long].collect().toSeq
    assert(ranked.take(2).toSet == Set(1L, 4L) && ranked.last == 2L)
  }

  test("tfidfKeywords: rare terms outrank common ones; ubiquitous terms score zero") {
    val corpus = Seq(
      (1L, "spark spark shuffle common"),
      (2L, "spark window common"),
      (3L, "spark common common")
    ).toDF("doc_id", "text")
    val got = Retrieval.tfidfKeywords(corpus, k = 2)
      .orderBy(col("doc_id"), col("rank"))
      .select("doc_id", "rank", "term", "tfidf")
      .as[(Long, Int, String, Double)].collect()
    // N=3; 'spark' and 'common' appear in every doc → idf = ln(1) = 0;
    // doc-unique terms (df=1) → idf = ln(3), tf=1
    val rare = math.log(3.0)
    assert(got.filter(_._1 == 1L).map(t => (t._3, t._4)).toSeq
      == Seq(("shuffle", round6(rare)), ("common", 0.0)))
    assert(got.filter(_._1 == 2L).map(_._3).toSeq == Seq("window", "common"))
    // doc 3 has no df=1 term: every keyword scores 0, tie → lexicographic
    assert(got.filter(_._1 == 3L).map(t => (t._3, t._4)).toSeq
      == Seq(("common", 0.0), ("spark", 0.0)))
  }

  test("rrfFuse: both-source docs outrank single-source; absent source contributes 0") {
    val lex = Seq((0L, 10L, 1), (0L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((0L, 20L, 1), (0L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, vec, k = 10)
      .orderBy(col("rank"))
      .select("doc_id", "rrf").as[(Long, Double)].collect()
    // d20 = 1/62 + 1/61 (both sources); d10 = 1/61; d30 = 1/62
    assert(got.map(_._1).toSeq == Seq(20L, 10L, 30L))
    assert(got(0)._2 == 1.0 / 62 + 1.0 / 61)
    assert(got(1)._2 == 1.0 / 61)
    assert(got(2)._2 == 1.0 / 62)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25: k truncates per query independently") {
    val q = Seq((0L, "apple"), (1L, "banana")).toDF("query_id", "text")
    val got = Retrieval.bm25Search(docs, q, k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 2L), (1L, 1L)))
  }
}
