package graft

import graft.operators.{Corpus, Dedup, Graph, TextAnalysis}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  /** Driver-side reference PageRank (adjacency maps, exact same
    * formula), for cross-checking the distributed operator.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0) + d * dangling / n)).toMap
    }
    rank
  }

  test("pageRank: cycle converges to uniform, mass conserved") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 3)
    got.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: hub/authority shape + dangling node matches reference impl") {
    // 0 and 1 both link to 2; 2 links to 3; 3 is dangling
    val e = Seq((0L, 2L), (1L, 2L), (2L, 3L))
    val got = Graph.pageRank(e.toDF("src", "dst"), iters = 8, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(e, 8, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
    // sinks outrank the no-in-link sources 0 and 1
    assert(got(2L) > got(0L) && got(3L) > got(0L) && got(0L) == got(1L))
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // dangling mass recycled
  }

  test("pageRank: parallel edges weight contributions per occurrence") {
    // 0 double-links to 1, single to 2: 1 gets 2/3 of 0's rank, 2 gets 1/3
    val e = Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L))
    val got = Graph.pageRank(e.toDF("src", "dst"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(e, 8, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
    assert(got(1L) > got(2L))
  }

  test("pageRank matches the reference impl on seeded random graphs (dangling + multi-edge)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 5 + rnd.nextInt(12)
      // ~2n edges; nodes can repeat (parallel edges) and some never
      // appear as src (dangling)
      val e = Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = Graph.pageRank(e.toDF("src", "dst"), iters = 6, damping = 0.85)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = refPageRank(e, 6, 0.85)
      assert(got.keySet == want.keySet, s"trial $trial node set")
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-12, s"trial $trial node $k: $v vs ${want(k)}")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"trial $trial mass")
    }
  }

  test("curate funnel equals composing the standalone operators on seeded random corpora") {
    val rnd = new scala.util.Random(7)
    val en = Seq("the", "and", "you", "that", "with")
    val de = Seq("der", "die", "und", "das", "ist")
    def doc(): String = {
      val pool = if (rnd.nextBoolean()) en else de
      val n = 5 + rnd.nextInt(60) // some below the 25-token quality floor
      Seq.fill(n)(pool(rnd.nextInt(pool.size)) + (
        if (rnd.nextInt(4) == 0) rnd.nextInt(9).toString else "")).mkString(" ")
    }
    for (trial <- 1 to 2) {
      val base = (1L to 40L).map(i => (i, doc()))
      // inject exact dups so stage 3 actually cuts
      val corpus = (base ++ base.take(8).map { case (i, t) => (i + 100L, t) })
        .toDF("doc_id", "text")
      val bench = base.filter(_._1 % 7 == 0).map(_._2).toDF("text")
      val rows = Corpus.curate(corpus, bench).orderBy("stage").collect()
      val docs = rows.map(_.getAs[Long]("docs"))
      val lang = corpus.where(TextAnalysis.langId(col("text")) === "en")
      val qual = lang.where(TextAnalysis.corpusFilterKeep(col("text")))
      val deduped = Dedup.exactDedup(qual)
      val dirty = Corpus.decontaminate(deduped, bench).select("doc_id")
      assert(docs(0) == corpus.count(), s"trial $trial input")
      assert(docs(1) == lang.count(), s"trial $trial lang")
      assert(docs(2) == qual.count(), s"trial $trial quality")
      assert(docs(3) == deduped.count(), s"trial $trial dedup")
      assert(docs(4) == deduped.join(dirty, Seq("doc_id"), "left_anti").count(),
        s"trial $trial decontaminate")
    }
  }

  test("sourceAudit: dup count, token sum, and keep rate per source") {
    val long = ("tok " * 30).trim // 30 tokens, passes every filter rule
    val docs = Seq(
      (1L, long, "a"), (2L, long, "a"), (3L, s"$long extra", "a"), // a: 1 dup pair
      (4L, "short", "b"), (5L, long, "b")                          // b: 1 of 2 keeps
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceAudit(docs).orderBy("source").collect()
    val a = got(0); val b = got(1)
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_distinct") == 2
      && a.getAs[Long]("n_exact_dups") == 1)
    assert(a.getAs[Long]("n_tokens") == 30 + 30 + 31)
    assert(a.getAs[Double]("keep_rate") == 1.0)
    assert(b.getAs[Long]("n_docs") == 2 && b.getAs[Long]("n_exact_dups") == 0)
    assert(b.getAs[Double]("keep_rate") == 0.5)
  }

  test("curate: funnel is monotone and stages agree with the standalone operators") {
    val good = (1 to 30).map(i => s"the and you that w$i").mkString(" ") // en, 180 toks
    val corpus = Seq(
      (1L, good),                       // survives everything
      (2L, good),                       // exact dup of 1 → cut at stage 3
      (3L, s"der die und das " * 40),   // German → cut at stage 1
      (4L, "the and you"),              // en but too short → cut at stage 2
      (5L, good + " unique tail here")  // survives (near-dup only)
    ).toDF("doc_id", "text")
    val bench = Seq((9L, good)).toDF("doc_id", "text") // contaminates 1, 2, 5
    val rows = Corpus.curate(corpus, bench.select(col("text")))
      .orderBy("stage").collect()
    val docs = rows.map(_.getAs[Long]("docs")).toSeq
    val toks = rows.map(_.getAs[Long]("tokens")).toSeq
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("0_input", "1_lang", "2_quality", "3_exact_dedup", "4_decontaminate"))
    assert(docs == Seq(5, 4, 3, 2, 0)) // 5 in; de out; short out; dup out; rest contaminated
    assert(docs.zip(docs.tail).forall { case (x, y) => y <= x }) // monotone
    assert(toks.zip(toks.tail).forall { case (x, y) => y <= x })
    // cross-check stage 3 against the standalone exact-dedup keeper set
    val qualityPass = corpus.where(
      TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.corpusFilterKeep(col("text")))
    assert(docs(3) == Dedup.exactDedup(qualityPass).count())
  }

  test("labelPropagation: planted cliques converge to per-clique min label") {
    // two 4-cliques joined by one bridge edge: after a few sync
    // rounds every member carries its clique's smallest id; the
    // single bridge cannot flip a clique (3 internal votes vs 1)
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L -> 10L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 8)
    for (n <- Seq(0L, 1L, 2L, 3L)) assert(got(n) == 0L, s"$n -> ${got(n)}")
    for (n <- Seq(10L, 11L, 12L, 13L)) assert(got(n) == 10L, s"$n -> ${got(n)}")
    // deterministic: same input, same labels, any run
    val again = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
    // self-loops and direction are ignored (symmetrized, src!=dst)
    val messy = (edges.collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
      :+ (5L -> 5L)).toDF("src", "dst")
    val got2 = Graph.labelPropagation(messy, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got) // the pure self-loop node has no real edges: absent
  }

  test("communityStats: per-community modularity terms on planted cliques") {
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L -> 10L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, rounds = 4)
    val got = Graph.communityStats(edges, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // m = 13 undirected edges; each clique: 6 internal, degree sum 13
    // (three deg-3 members + the deg-4 bridge endpoint);
    // q = 6/13 − (13/26)² = 0.211538
    assert(got.keySet == Set(0L, 10L))
    for (c <- Seq(0L, 10L)) {
      val (nodes, internal, degSum, q) = got(c)
      assert(nodes == 4 && internal == 6 && degSum == 13, got(c).toString)
      assert(math.abs(q - (6.0 / 13 - 0.25)) < 1e-6, q.toString)
    }
    // whole-partition modularity = Σ q_term; for this split it is
    // positive (better than random) — the audit the op exists for
    assert(got.values.map(_._4).sum > 0.4)
  }

  test("communityStats: degenerate graphs (no edges / self-loops only) yield zero terms, never NaN") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "label")
    // edge-free: m = 0 — every community must report exact zeros, not
    // a NaN/Infinity q_term from an unguarded divide
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val gotEmpty = Graph.communityStats(empty, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(gotEmpty.keySet == Set(1L, 3L))
    assert(gotEmpty(1L) == ((2L, 0L, 0L, 0.0)), gotEmpty.toString)
    assert(gotEmpty(3L) == ((1L, 0L, 0L, 0.0)), gotEmpty.toString)
    assert(gotEmpty.values.forall(v => !v._4.isNaN && !v._4.isInfinity))
    // self-loops only: they are stripped before counting, so m is
    // still 0 — same zero contract
    val loops = Seq((1L, 1L), (3L, 3L)).toDF("src", "dst")
    val gotLoops = Graph.communityStats(loops, labels).collect()
      .map(r => r.getDouble(4))
    assert(gotLoops.forall(q => q == 0.0))
    // and the rest of the family degrades cleanly on the empty graph
    assert(Graph.labelPropagation(empty, rounds = 3).count() == 0)
    assert(Graph.labelPropagation(loops, rounds = 3).count() == 0)
  }

  test("hits: star graph ranks the center as sole authority, leaves as hubs") {
    // 1..4 all link to 0; 0 links nowhere
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("src", "dst")
    val m = Graph.hits(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m(0L) == ((1.0, 0.0))) // max authority, zero hub
    (1L to 4L).foreach { n => assert(m(n) == ((0.0, 1.0))) } // pure equal hubs
  }

  test("hits: authority follows in-link mass from strong hubs") {
    // 1 and 2 are hubs; node 3 is linked by both, node 4 by one
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (3L, 5L))
      .toDF("src", "dst")
    val m = Graph.hits(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m(3L)._1 == 1.0)           // doubly-linked: top authority
    assert(m(4L)._1 < m(3L)._1 && m(4L)._1 > 0.0)
    assert(m(1L)._2 == 1.0)           // links both top authorities: top hub
    assert(m(2L)._2 < m(1L)._2 && m(2L)._2 > 0.0)
    assert(m(5L)._2 == 0.0)           // links nothing
  }

  test("corpusFilterKeep column twin matches corpusFilter's keep flag row-wise") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val viaDf = TextAnalysis.corpusFilter(docs).select(col("doc_id"), col("keep"))
    val viaCol = docs.select(col("doc_id"),
      TextAnalysis.corpusFilterKeep(col("text")).cast("int").as("keep2"))
    assert(viaDf.join(viaCol, "doc_id").where(col("keep") =!= col("keep2")).count() == 0)
  }

  test("bfsHops: path graph labels exact hop distances, bounded by maxHops") {
    // 0→1→2→3→4→5, seed {0}: hop(i) = i, cut at maxHops
    val e = (0L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsHops(e, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("bfsHops: multi-source takes the minimum over seeds; unreachable absent") {
    // two chains meeting at 2; 9→10 disconnected from the seeds
    val e = Seq((0L, 1L), (1L, 2L), (5L, 2L), (2L, 3L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(0L, 5L).toDF("node")
    val got = Graph.bfsHops(e, seeds, maxHops = 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 2 is 1 hop from seed 5 (not 2 hops via 0→1→2)
    assert(got == Map(0L -> 0, 5L -> 0, 1L -> 1, 2L -> 1, 3L -> 2))
    assert(!got.contains(9L) && !got.contains(10L))
  }

  test("kCore: K4 survives the 3-core, attached tail peels off in cascade") {
    // K4 on {0,1,2,3}; tail 3-4-5: 5 (deg 1) peels, then 4 (deg 1)
    val e = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong))
      .toSeq ++ Seq((3L, 4L), (4L, 5L))
    val got = Graph.kCore(e.toDF("src", "dst"), k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 3))
  }

  test("triangleCounts: K4 gives 3 per node; square+diagonal gives 1/2 split") {
    // K4: every node sits on C(3,2) = 3 triangles
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val g1 = Graph.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 3))
    // square 0-1-2-3 with diagonal 0-2: triangles {0,1,2} and {0,2,3};
    // duplicate/reversed/self edges must not change counts
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L),
      (2L, 0L), (1L, 0L), (1L, 1L)).toDF("src", "dst")
    val g2 = Graph.triangleCounts(sq).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(0L -> 2, 1L -> 1, 2L -> 2, 3L -> 1))
  }
}
