package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation.
  *
  * A web-scale training corpus carries an implicit hyperlink graph,
  * and graph centrality is a standard document-quality prior (the
  * original use of PageRank; crawl frontiers and corpus weighting
  * still rank hosts/pages this way). The dedup family already has
  * connected components (Dedup.connectedComponents); this file holds
  * the rank-propagation side.
  *
  * Scale posture: edges are materialized ONCE (partitioned on src)
  * and reused every round. Per iteration the only edge-proportional
  * exchange is the contribution aggregate on `dst`, and it map-side
  * combines to node-sized partial sums before moving; the rank⋈edges
  * join reads the stored edge partitioning (AQE broadcasts the
  * smaller side outright on small graphs), and the remaining
  * exchanges are node-sized (rank/deg reattach — ranks are one row
  * per node ≪ edges). Lineage is truncated with `localCheckpoint`
  * every few rounds so round N never replays rounds 1..N-1 (same
  * discipline as Dedup.connectedComponents).
  */
object Graph {

  /** PageRank over an edge list `(src, dst)` (long ids; parallel
    * edges count once per occurrence, as repeated links do).
    *
    * Node set = all ids appearing as src or dst. Dangling nodes (no
    * out-edges) redistribute their mass uniformly each round — the
    * standard stochastic-matrix completion, computed as ONE scalar
    * aggregate over the (node-sized) rank table, not an edge pass.
    *
    * Returns (node, rank) with sum(rank) ≈ 1.
    */
  def pageRank(edges: DataFrame, iters: Int = 8, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    // materialize edges once, partitioned on src: every iteration's
    // rank⋈edges join then co-partitions on the rank side only
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val base = (1.0 - damping) / n

    // (node, deg) — deg null for dangling nodes
    val nodeDeg = nodes.join(outDeg, nodes("node") === outDeg("src"), "left")
      .select(col("node"), col("deg"))
      .localCheckpoint(true)

    // graphs with no dangling nodes (common after frontier cleaning)
    // skip the per-iteration mass aggregate entirely — one upfront
    // node-sized count instead of `iters` extra jobs
    val hasDangling = nodeDeg.where(col("deg").isNull).limit(1).count() > 0

    var ranks = nodeDeg.select(col("node"), col("deg"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val danglingMass = if (!hasDangling) 0.0
      else ranks.where(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head.getDouble(0)
      val contribs = ranks.where(col("deg").isNotNull)
        .join(e, ranks("node") === e("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      ranks = nodeDeg.join(contribs, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + lit(damping) * coalesce(col("in_mass"), lit(0.0))
            + lit(damping * danglingMass / n)).as("rank"))
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("rank"))
  }

  /** HITS (Kleinberg): mutually-reinforcing hub and authority scores
    * over an edge list `(src, dst)` — the classic complement to
    * PageRank for link corpora (a page LINKING many authorities is a
    * hub; a page linked FROM many hubs is an authority; crawl seeds
    * and link-spam screens read both).
    *
    * Per iteration: auth ← Σ_{j→i} hub(j), then hub ← Σ_{i→j}
    * auth(j). Both updates are LINEAR, so normalization commutes
    * with them — the scores are normalized ONCE at the end instead
    * of every round, which removes every per-iteration driver
    * action (the reason pageRank's loop costs one lazy plan, not
    * 4 jobs a round; raw values grow only ×(max degree) per
    * half-step — ~3^10 here — nowhere near double overflow for any
    * sane iteration count). The normalizer is the MAX (L∞), not the
    * usual L2: max of doubles is exact and order-independent at any
    * parallelism, while a sum-of-squares is a node-sized float
    * reduction whose association order differs across engines —
    * same eigenvector direction, deterministic arithmetic (the
    * pageRank float contract).
    *
    * Scale shape mirrors pageRank: edges materialized once on src;
    * the two edge-proportional exchanges per round are the in/out
    * contribution aggregates (map-side combined to node-sized
    * partials); lineage checkpoint-truncated every 2 rounds; the
    * final normalize is one node-sized materialization + a broadcast
    * 1-row max join.
    */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    // SPARSE iteration (r12): a node absent from auth/hub has score 0,
    // and zero scores contribute nothing to either sum — so the
    // per-round reattach-zeros joins against the node table (2 × iters
    // node-sized joins) are pure waste; zeros reattach ONCE at the
    // end. Values stay exact: every score is an integer-valued double
    // (sums of 1.0s, then sums of integer sums — far below 2^53 at
    // ~×maxdeg growth per half-step), so dropping/adding zero rows
    // cannot move any sum by even an ulp.
    var auth = nodes.select(col("node"), lit(1.0).as("auth"))
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    for (i <- 1 to iters) {
      auth = hub.join(e, hub("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth"))
      hub = auth.join(e, auth("node") === e("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hub"))
      if (i % 2 == 0 && i < iters) {
        auth = auth.localCheckpoint(true)
        hub = hub.localCheckpoint(true)
      }
    }
    // reattach the zero rows once, materialize once: the raw table
    // feeds both the 1-row max agg and the normalized output (§5
    // materialize-once rule)
    val raw = nodes
      .join(auth, Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .select(col("node"), coalesce(col("auth"), lit(0.0)).as("auth"),
        coalesce(col("hub"), lit(0.0)).as("hub"))
      .localCheckpoint(true)
    val mx = raw.agg(max(col("auth")).as("am"), max(col("hub")).as("hm"))
    raw.crossJoin(broadcast(mx))
      .select(col("node"), (col("auth") / col("am")).as("auth"),
        (col("hub") / col("hm")).as("hub"))
  }

  /** Multi-source BFS: minimum hop count from any seed node, bounded
    * at `maxHops` (crawl-depth / link-distance labeling — "how far is
    * this page from a trusted seed set", the TrustRank-style distance
    * prior; also the reachability half of graph curation).
    *
    * Frontier-based: each round expands ONLY the nodes first reached
    * last round (not the whole dist table), so total join work is
    * O(sum of frontier out-degrees) = O(|E|) across ALL rounds
    * combined — the textbook parallel BFS work bound. The expand join
    * reads the stored src partitioning of the materialized edge
    * table; the anti-join that drops already-visited nodes is
    * node-sized. Both frontier and dist are checkpoint-truncated
    * every round (rounds are few and each materialization is
    * node-bounded). Nodes unreachable within maxHops are absent.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .localCheckpoint(true)
    var dist = seeds.select(col("node").cast("long"), lit(0).as("hop"))
      .distinct()
      .localCheckpoint(true)
    var frontier = dist
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hop"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        // no checkpoint on the union: every leaf is already
        // materialized, and the union tree is ≤ maxHops deep — one
        // fewer job per round
        dist = dist.union(next)
        frontier = next
        h += 1
      }
    }
    dist
  }

  /** k-core decomposition by iterative peeling (bounded rounds):
    * repeatedly drop nodes whose degree in the surviving subgraph is
    * < k; what remains is the k-core — the standard "dense nucleus"
    * extraction (link-spam nests and genuine topic hubs both live in
    * high cores; crawl prioritization and graph-cleaning pipelines
    * peel low cores off first).
    *
    * Returns (node, deg) for nodes of the k-core, deg measured in the
    * final surviving subgraph. `maxRounds` bounds the cascade; the
    * loop exits early when a round removes nothing (the fixpoint).
    *
    * Scale: the edge table materializes once; each round is one
    * semi-join of edges against surviving nodes + a map-combined
    * degree aggregate (edge-proportional, shrinking every round) —
    * the peeling cascade's total work is O(rounds · |E_surviving|),
    * and lineage is checkpoint-truncated per round.
    */
  /** Synchronous label propagation (community detection — the
    * host/domain clustering pass corpus curation runs before
    * per-community quotas or contamination sweeps): every node starts
    * labeled with its own id; each round it adopts the most frequent
    * label among its neighbors, ties to the SMALLEST label.
    * Deterministic at any parallelism — the vote is an exact integer
    * count and the tie-break total. `rounds` is FIXED (sync LPA can
    * 2-cycle on bipartite structure; a fixed round count keeps the
    * result well-defined and lets the DuckDB oracle unroll the exact
    * same rounds).
    *
    * Scale: the symmetrized edge list materializes ONCE partitioned
    * on dst (the side every round's vote join probes — label rows
    * co-locate to it); per round the only edge-proportional exchange
    * is the (node, label) vote count, which map-side combines to at
    * most one row per distinct neighbor label per node before moving;
    * the arg-max window runs on those votes, never on edges. Lineage
    * is checkpoint-truncated every other round.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    val w = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label").asc)
    for (r <- 1 to rounds) {
      val votes = und
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .withColumnRenamed("src", "node")
      labels = votes.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("node"), col("label"))
      if (r % 2 == 0 && r < rounds) labels = labels.localCheckpoint(true)
    }
    labels
  }

  /** Per-community partition-quality audit (the modularity
    * decomposition): for every label in `labels`, the member count,
    * internal undirected edge count, total member degree, and the
    * community's modularity term q = e_in/m − (deg_c/2m)² — the
    * quantity community detection maximizes, reported per community
    * so a polluted or fragmented cluster is visible BEFORE quotas or
    * sweeps key on it. Exactness: m, e_in, deg_c are exact integers;
    * q is one fixed-shape double expression of them (divide-first),
    * rounded to 6dp — no cross-row float accumulation anywhere, so
    * rows hash-compare engine-exactly.
    *
    * Scale: edges canonicalize/distinct once; the label tag is two
    * node-keyed joins (labels are node-sized); every aggregate
    * map-side combines to |labels| rows.
    */
  def communityStats(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val m = e.count().toDouble
    // m == 0 (no edges after self-loop/dup removal): every community's
    // e_in and degree are 0 and the modularity term is defined as 0 —
    // branch at plan-build so the divide below never sees a 0 divisor
    // (NaN rows are not a degrade contract, they're a wrong answer)
    val qTerm =
      if (m == 0.0) lit(0.0)
      else round(
        coalesce(col("internal_edges"), lit(0L)).cast("double") / m -
          (col("degree_sum").cast("double") / (2 * m)) *
          (col("degree_sum").cast("double") / (2 * m)), 6)
    val la = labels.select(col("node").as("a"), col("label").as("la"))
    val lb = labels.select(col("node").as("b"), col("label").as("lb"))
    val internal = e.join(la, Seq("a")).join(lb, Seq("b"))
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("internal_edges"))
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val per = labels.join(deg, Seq("node"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("nodes"),
        sum(coalesce(col("deg"), lit(0L))).as("degree_sum"))
    per.join(internal, Seq("label"), "left")
      .select(col("label"), col("nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum"),
        qTerm.as("q_term"))
  }

  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 8): DataFrame = {
    var e = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = e.count()
    var round = 0
    var stable = false
    while (round < maxRounds && !stable && nEdges > 0) {
      val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val alive = deg.where(col("d") >= k).select(col("node"))
      val e2 = e.join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val n2 = e2.count()
      if (n2 == nEdges) stable = true
      e = e2; nEdges = n2; round += 1
    }
    // non-fixpoint exit: the final deg>=k filter below would drop nodes
    // while their edges still inflate survivors' reported degrees —
    // warn like connectedComponents does rather than silently return a
    // supergraph-with-wrong-degrees (r6 ADVICE item).
    if (!stable && nEdges > 0)
      System.err.println(s"[graft] kCore: no fixpoint after $maxRounds " +
        s"rounds ($nEdges edges alive) — result may be a supergraph of " +
        "the true k-core; raise maxRounds")
    e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .where(col("deg") >= k)
  }

  /** Per-node triangle counts over the undirected simple graph of
    * `edges` (local clustering signal — triangle-dense neighborhoods
    * indicate mutually-linking cliques, i.e. link farms; triangle
    * sparsity around a high-degree node indicates a genuine hub).
    *
    * Degree-oriented enumeration (the MapReduce-classic of Suri &
    * Vassilvitskii's "Counting Triangles and the Curse of the Last
    * Reducer"): each undirected edge is oriented from its
    * (degree, id)-smaller endpoint to the larger, making the edge set
    * a DAG whose max out-degree is O(√|E|) on ANY graph — so the
    * wedge self-join (the only superlinear stage) does
    * O(|E|^{3/2}) work even under power-law skew, instead of the
    * O(Σ deg²) a naive neighbor join does (quadratic in the hottest
    * hub). Wedges carry 3 longs; raw degrees ride along as join
    * payloads of 1 long. Each triangle is found exactly once
    * (u < v < w in the orientation order) and credited to all three
    * corners.
    *
    * Returns (node, n_tri) for every node of the graph (0 if none).
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    // orient by (deg, id): ku/kv are the total-order keys of the two
    // endpoints; the oriented edge runs smaller-key → larger-key
    val withDeg = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), Seq("a"))
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), Seq("b"))
    val ka = struct(col("da").as("d"), col("a").as("i"))
    val kb = struct(col("db").as("d"), col("b").as("i"))
    val oriented = withDeg.select(
      when(ka < kb, col("a")).otherwise(col("b")).as("u"),
      when(ka < kb, col("b")).otherwise(col("a")).as("v"),
      when(ka < kb, kb).otherwise(ka).as("kv"))
      .localCheckpoint(true)
    // wedges: ordered pairs of out-neighbors of u; closed iff v→w oriented
    val x = oriented.select(col("u"), col("v").as("v1"), col("kv").as("k1"))
    val y = oriented.select(col("u"), col("v").as("v2"), col("kv").as("k2"))
    val wedges = x.join(y, Seq("u")).where(col("k1") < col("k2"))
      .select(col("u"), col("v1"), col("v2"))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    val tris = wedges.join(closing, Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tris
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.select(col("n").as("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
