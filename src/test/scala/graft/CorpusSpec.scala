package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpecBase {
  import spark.implicits._

  test("decontaminate: docs sharing an n-gram with the benchmark are flagged") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely unrelated text about spark shuffle partitions and joins"),
      (3L, "prefix words then the quick brown fox jumps over the lazy dog too")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val got = Corpus.decontaminate(corpus, benchmark, n = 8)
      .orderBy("doc_id").collect()
    // docs 1 and 3 contain the benchmark 8-gram; doc 2 is clean
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L))
    assert(got.forall(_.getAs[Long]("n_shared") >= 1L))
  }

  test("packSequences: cumulative layout, boundary straddling, per-shard namespacing") {
    // single shard (nShards=1) for predictable layout: docs of 100
    // tokens each, 256-token sequences
    val text100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = (1L to 5L).map(i => (i, text100)).toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, tokensPerSeq = 256, nShards = 1)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("cum")).toSeq == Seq(100L, 200L, 300L, 400L, 500L))
    // doc 3 spans tokens [200,300): straddles the 256 boundary → seqs 0..1
    assert(got.map(r => (r.getAs[Long]("start_seq"), r.getAs[Long]("end_seq"))).toSeq ==
      Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L)))
    // deterministic: a second run yields identical rows
    val again = Corpus.packSequences(docs, tokensPerSeq = 256, nShards = 1)
      .orderBy("doc_id").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // empty docs never occupy a sequence
    val withEmpty = docs.union(Seq((9L, "")).toDF("doc_id", "text"))
    assert(Corpus.packSequences(withEmpty, 256, 1).count() == 5)
  }

  test("stratifiedSample: full rate keeps stratum, zero drops it, default applies") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh", s"doc $i")).toDF("doc_id", "lang", "text")
    val kept = Corpus.stratifiedSample(docs, "lang",
      Map("en" -> 10000, "zh" -> 0), defaultBps = 0)
    assert(kept.count() == 100) // all en, no zh
    assert(kept.where(col("lang") === "zh").count() == 0)
    // default rate applies to unlisted strata and is deterministic
    val some = Corpus.stratifiedSample(docs, "lang", Map("en" -> 0), defaultBps = 5000)
    val n1 = some.count()
    assert(n1 > 0 && n1 < 100) // ~half the zh docs
    assert(some.count() == n1)
  }
}
