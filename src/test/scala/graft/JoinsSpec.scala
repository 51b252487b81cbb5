package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpecBase {
  import spark.implicits._

  test("asOfJoin attaches the latest right row at-or-before each left row") {
    // key=1: quotes at ord 10, 20, 40 — trades at 5 (before any), 20
    // (exact match), 35 (last quote 20), 50 (last quote 40)
    val trades = Seq((1L, 5L, "t0"), (1L, 20L, "t1"), (1L, 35L, "t2"), (1L, 50L, "t3"), (2L, 7L, "t4"))
      .toDF("key", "ord", "trade")
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 40L, 4.0))
      .toDF("key", "ord", "px")

    val out = Joins.asOfJoin(trades, quotes, "key", "ord", Seq("px"))
      .select("trade", "asof_px").as[(String, Option[Double])].collect().toMap

    assert(out("t0").isEmpty)      // no quote yet
    assert(out("t1").contains(2.0)) // equal ord counts as "at or before"
    assert(out("t2").contains(2.0))
    assert(out("t3").contains(4.0))
    assert(out("t4").isEmpty)      // key 2 has no quotes
  }

  test("asOfJoin keeps every left row and all its columns") {
    val left = Seq((1L, 10L, "a", 42)).toDF("key", "ord", "tag", "extra")
    val right = Seq((9L, 1L, "x")).toDF("key", "ord", "payload")
    val out = Joins.asOfJoin(left, right, "key", "ord", Seq("payload"))
    assert(out.columns.toSeq == Seq("key", "ord", "tag", "extra", "asof_payload"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(4))
  }

  test("asOfJoin ignores null keys and null ords on the right (equi-join semantics)") {
    val left = Seq((Some(1L), 10L, "a"), (None, 10L, "b"))
      .toDF("key", "ord", "tag")
    val right = Seq((None, Some(5L), 1.0), (Some(1L), None, 2.0), (Some(1L), Some(7L), 3.0))
      .toDF("key", "ord", "px")
    val out = Joins.asOfJoin(left, right, "key", "ord", Seq("px"))
      .select("tag", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(3.0)) // only the non-null (key, ord) row matches
    assert(out("b").isEmpty)       // null-key left row matches nothing
  }

  test("saltedJoin keeps probe rows whose salt expression is null") {
    val probe = Seq((1L, Some(4)), (1L, None)).toDF("k", "x")
    val build = Seq((1L, "hit")).toDF("k", "v")
    val out = Joins.saltedJoin(probe, build, "k", col("x"), nSalts = 4)
    assert(out.count() == 2) // the null-x row must not be silently dropped
  }

  test("saltedJoin output equals the plain join") {
    val fact = spark.read.parquet(sf() + "/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val dim = spark.read.parquet(sf() + "/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val salted = Joins.saltedJoin(fact, dim, "o_orderkey", hash(col("l_linenumber")), nSalts = 4)
      .groupBy("o_orderpriority").count()
    val plain = fact.join(dim, "o_orderkey").groupBy("o_orderpriority").count()
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("skewSaltedJoin output equals the plain join; only hot keys take the salted path") {
    // key 1 is hot (6 probe rows), keys 2-4 are cold (1 each)
    val probe = (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "x")
    val build = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "orphan")).toDF("k", "v")
    val out = Joins.skewSaltedJoin(probe, build, "k", hash(col("x")), nSalts = 4,
      hotThreshold = 3)
    val plain = probe.join(build, "k")
    assert(out.select("k", "x", "v").except(plain.select("k", "x", "v")).isEmpty)
    assert(plain.select("k", "x", "v").except(out.select("k", "x", "v")).isEmpty)
    assert(out.count() == plain.count()) // bag-equal, not just set-equal
    // the salted (hot) branch saw ONLY the hot key: the build explode
    // fans out 4 salts for key 1 alone, not for the cold keys
    val hotOnly = Joins.skewSaltedJoin(probe.where(col("k") =!= 1L), build, "k",
      hash(col("x")), nSalts = 4, hotThreshold = 3)
    assert(hotOnly.count() == 2) // no hot keys left → pure cold path
  }

  test("bandJoin assigns each row to its [lo, hi) band") {
    val facts = Seq((1L, 0.5), (2L, 5.0), (3L, 4.99), (4L, 100.0)).toDF("id", "v")
    val bands = Seq(("a", 0.0, 5.0), ("b", 5.0, 200.0)).toDF("band", "lo", "hi")
    val out = Joins.bandJoin(facts, bands, "v")
      .select("id", "band").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "b"))
  }

  test("intervalOverlapJoin equals the brute-force nested loop, each pair once") {
    // deterministic pseudo-random intervals: negative starts, lengths
    // from 1 to 3x the tile, touching endpoints (half-open: NOT a
    // match), exact duplicates
    def mk(seed: Int, n: Int) = (0 until n).map { i =>
      val s = ((i * 7919 + seed * 104729) % 2000) - 500L
      val len = 1L + (i * 31 + seed) % 150
      (i.toLong + seed * 1000, s, s + len)
    }
    val ls = mk(1, 80)
    val rs = mk(2, 90) :+ (9999L, ls.head._2 + (ls.head._3 - ls.head._2), 3000L) // touching
    val left = ls.toDF("l_id", "l_start", "l_end")
    val right = rs.toDF("r_id", "r_start", "r_end")
    val got = Joins.intervalOverlapJoin(left, right, tile = 50)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    val want = for {
      (li, lsT, le) <- ls
      (ri, rsT, re) <- rs
      if lsT < re && rsT < le
    } yield (li, ri)
    assert(got.size == got.distinct.size) // emitted exactly once
    assert(got.toSet == want.toSet)
    assert(got.size == want.size)
  }
}
