package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

/** Eval.auc against hand-computed Mann-Whitney values, including the
  * tie and degenerate-class cases the histogram formulation must get
  * right.
  */
class EvalSpec extends SparkSpecBase {
  import spark.implicits._

  private def aucOf(rows: Seq[(String, Long, Int)]): Map[String, (Long, Long, Option[Double])] = {
    val df = rows.toDF("g", "score", "label")
    Eval.auc(df, col("g"), col("score"), col("label"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
  }

  test("perfect separation gives AUC 1, inverted gives 0") {
    val m = aucOf(Seq(
      ("a", 10L, 1), ("a", 9L, 1), ("a", 2L, 0), ("a", 1L, 0),
      ("b", 1L, 1), ("b", 2L, 1), ("b", 9L, 0), ("b", 10L, 0)))
    assert(m("a") == ((2L, 2L, Some(1.0))))
    assert(m("b") == ((2L, 2L, Some(0.0))))
  }

  test("ties take average rank") {
    // scores: pos {5, 3}, neg {3, 1}. Pairs: (5>3)=1, (5>1)=1,
    // (3=3)=0.5, (3>1)=1  =>  U = 3.5, AUC = 3.5/4 = 0.875
    val m = aucOf(Seq(("g", 5L, 1), ("g", 3L, 1), ("g", 3L, 0), ("g", 1L, 0)))
    assert(m("g") == ((2L, 2L, Some(0.875))))
  }

  test("all-tied scores give AUC 0.5") {
    val m = aucOf(Seq(("g", 7L, 1), ("g", 7L, 0), ("g", 7L, 1), ("g", 7L, 0)))
    assert(m("g") == ((2L, 2L, Some(0.5))))
  }

  test("single-class group yields NULL auc, counts intact") {
    val m = aucOf(Seq(("g", 5L, 1), ("g", 3L, 1)))
    assert(m("g") == ((2L, 0L, None)))
  }

  test("matches the brute-force pair count on a random mix") {
    val rows = (0 until 200).map { i =>
      val score = (i * 37 % 13).toLong
      val label = if ((i * 101 % 7) < 3) 1 else 0
      ("g", score, label)
    }
    val pos = rows.filter(_._3 == 1).map(_._2)
    val neg = rows.filter(_._3 == 0).map(_._2)
    val u = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val expected = u / (pos.size.toDouble * neg.size)
    val m = aucOf(rows)
    assert(math.abs(m("g")._3.get - expected) < 1e-12)
  }

  test("rankMetrics computes RR and AP@k by hand-checkable values") {
    // query 1: ranked [a b c d], relevant {b, d}
    //   RR = 1/2; AP@4 = (1/2 + 2/4) / 4 = 0.25
    // query 2: ranked [a b], relevant {x} -> RR = AP = 0, n_rel = 0
    val ranked = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (1L, "d", 4),
      (2L, "a", 1), (2L, "b", 2)
    ).toDF("query_id", "nbr_id", "rank")
    val rel = Seq((1L, "b"), (1L, "d"), (2L, "x")).toDF("query_id", "nbr_id")
    val m = Eval.rankMetrics(ranked, rel, k = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(m(1L) == ((2L, 0.5, 0.25)))
    assert(m(2L) == ((0L, 0.0, 0.0)))
  }

  test("ndcg IDCG uses the full relevant-set size, not retrieved count") {
    // query 1: 10 relevant items exist; the retriever finds exactly ONE
    // and ranks it first. Standard nDCG must be 1/IDCG(10) ≈ 0.22 —
    // NOT 1.0 (which would mask the recall loss; r6 ADVICE item).
    val ranked = ((1 to 10).map(r =>
      (1L, if (r == 1) 100L else 200L + r, r)) ++
      (1 to 10).map(r => (2L, 100L + r - 1, r)))
      .toDF("query_id", "nbr_id", "rank")
    val rel = (for (q <- Seq(1L, 2L); n <- 100L to 109L) yield (q, n))
      .toDF("query_id", "nbr_id")
    val m = Eval.ndcg(ranked, rel, k = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val idcg10 = (1 to 10).map(i => math.log(2) / math.log(i + 1)).sum
    assert(m(1L)._1 == 1L)
    assert(math.abs(m(1L)._2 - 1.0 / idcg10) < 1e-6)
    assert(m(1L)._2 < 0.25) // the recall loss is visible
    // query 2 retrieves all 10 relevant in ideal order -> exactly 1.0
    assert(m(2L) == ((10L, 1.0)))
  }

  test("ndcg is 0 when the query has no relevant set at all") {
    val ranked = Seq((1L, 5L, 1), (1L, 6L, 2)).toDF("query_id", "nbr_id", "rank")
    val rel = Seq((9L, 5L)).toDF("query_id", "nbr_id")
    val m = Eval.ndcg(ranked, rel, k = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((0L, 0.0)))
  }
}
