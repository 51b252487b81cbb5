package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver-provided sf0.1 testdata for
  * LOCAL scale validation (the driver's tables are read-only and top
  * out at sf0.1; every published number so far is sf0.1-only). Usage:
  *
  *   runMain graft.GenData <srcSfDir> <outDir> <factor>
  *
  * Each table is replicated `factor` times with copy-offset keys so
  * referential integrity holds per copy (copy i of lineitem references
  * copy i of orders/part/supplier, etc.); the fixed dimensions
  * (region, nation) are not scaled, matching TPC-H. Two tables get
  * content perturbation instead of verbatim copies, because verbatim
  * replication would CHANGE THE WORKLOAD SHAPE, not just its size:
  *
  *  - documents: an exact 10× text copy gives every doc 9 exact
  *    duplicates, so dedup pair counts grow quadratically in the
  *    factor (each group of f copies yields f(f-1)/2 pairs) and the
  *    near-dup benchmarks measure a pathological corpus rather than a
  *    bigger one. Copy i > 0 rewrites ~every third token, keyed by
  *    xxhash64(doc_id, position, copy) so rewrite patterns are
  *    INDEPENDENT across copies (r8: any mod-k arithmetic in `copy`
  *    is periodic and hands same-residue copies identical patterns —
  *    quadratic cross-copy pair growth), dropping cross-copy 3-gram
  *    Jaccard, minhash, and simhash similarity well below every dedup
  *    threshold — pair density per document stays that of sf0.1 (the
  *    corpusWithDups-injected dups), volume grows linearly.
  *  - embeddings: copy i > 0 sign-flips ~1/3 of coordinates (keyed by
  *    xxhash64(vec_id, dim, copy), same independence argument),
  *    pushing cross-copy cosine to ≈1/9, far below near-dup/ANN
  *    thresholds at any factor.
  *
  * Deterministic: pure column expressions of (id, copy), no RNG — the
  * same invocation always writes byte-identical tables.
  */
object GenData {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenData <srcSfDir> <outDir> <factor>")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1)
    val spark = GraftSession.get()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // copies as a column: table ⨯ range(factor) with key offsets
    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).select(col("id").cast("int").as("copy")))

    // key stride: next power of 10 above the max key, so offset keys
    // are disjoint and reversible by eye (copy = key / stride)
    def stride(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key))).head.getLong(0)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }

    val customer = read("customer"); val kc = stride(customer, "c_custkey")
    val supplier = read("supplier"); val ks = stride(supplier, "s_suppkey")
    val part = read("part"); val kp = stride(part, "p_partkey")
    val orders = read("orders"); val ko = stride(orders, "o_orderkey")
    val docs = read("documents"); val kd = stride(docs, "doc_id")
    val emb = read("embeddings"); val kv = stride(emb, "vec_id")
    val events = read("events")
    val ke = stride(events, "event_id"); val ku = stride(events, "user_id")

    read("region").write.mode("overwrite").parquet(s"$out/region.parquet")
    read("nation").write.mode("overwrite").parquet(s"$out/nation.parquet")

    write(copies(customer).select(
      (col("c_custkey") + col("copy") * kc).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer", factor)

    write(copies(supplier).select(
      (col("s_suppkey") + col("copy") * ks).as("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal")),
      "supplier", factor)

    write(copies(part).select(
      (col("p_partkey") + col("copy") * kp).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part", factor)

    write(copies(orders).select(
      (col("o_orderkey") + col("copy") * ko).as("o_orderkey"),
      (col("o_custkey") + col("copy") * kc).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders", factor)

    write(copies(read("lineitem")).select(
      (col("l_orderkey") + col("copy") * ko).as("l_orderkey"),
      (col("l_partkey") + col("copy") * kp).as("l_partkey"),
      (col("l_suppkey") + col("copy") * ks).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")),
      "lineitem", factor * 4)

    // ts was TIMESTAMP(NANOS), surfaced as long under nanosAsLong — the
    // scaled table keeps the long (every consumer reads it that way)
    write(copies(events).select(
      (col("event_id") + col("copy") * ke).as("event_id"),
      col("ts"),
      (col("user_id") + col("copy") * ku).as("user_id"),
      col("event_type"), col("value"), col("props")),
      "events", factor)

    // Copy i > 0 rewrites tokens under TWO keyed rules; copy 0 is the
    // original text. Both rules are load-bearing (r8, each learned
    // from a measured sf10 failure mode):
    //  1. stride-3 with a per-(doc, copy) hash offset: every 3-token
    //     window contains ≥1 rewritten token, so NO original 3-gram
    //     survives into any copy — without this (a pure per-position
    //     hash rewrite leaves (2/3)³ ≈ 30% of windows intact in EVERY
    //     copy) the surviving shingles bucket all `factor` copies
    //     together and the ngram candidate stage goes quadratic
    //     (measured: ~2·10⁹ candidates and a disk-full crash at
    //     factor 100). The offset must be hash-keyed, not linear in
    //     copy: (i + doc + copy) % 3 hands copies of equal copy % 3
    //     IDENTICAL patterns, whose shared token multisets inflate the
    //     simhash family quadratically (measured: 1.05M pairs at
    //     factor 100 vs the linear ~180k).
    //  2. an extra ~1/7 of positions by per-(doc, pos, copy) hash:
    //     decorrelates the token multisets of copies that drew the
    //     same stride offset (1/3 of copy pairs), keeping their
    //     simhash fingerprints apart.
    // Replacement tokens carry the copy index (tok~c), so even
    // same-position rewrites differ across copies.
    val strideOff = pmod(xxhash64(col("doc_id"), col("copy")), lit(3))
    val perturbed = transform(split(col("text"), "\\s+"),
      (tok, i) => when(col("copy") === 0 ||
          (pmod(i + strideOff, lit(3)) =!= 0 &&
           pmod(xxhash64(col("doc_id"), i, col("copy")), lit(7)) =!= 0), tok)
        .otherwise(concat(tok, lit("~"), col("copy"))))
    write(copies(docs).select(
      (col("doc_id") + col("copy") * kd).as("doc_id"),
      array_join(perturbed, " ").as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", factor)

    // sign-flip ~1/3 of dims, keyed on xxhash64(vec_id, dim, copy).
    // Same r8 fix as documents: the old (vec_id + dim·31 + copy·17) % 3
    // condition is periodic in copy mod 3, giving copies of equal
    // copy % 3 IDENTICAL flip patterns — cross-copy cosine exactly 1.0,
    // ~(factor/3)² same-residue pairs per base vector, and a 9.5M-pair
    // / 167 s d_dedup_embedding at factor 100 where linear behavior
    // yields ~22k pairs. Independent hash flips put two copies' expected
    // same-sign fraction at 5/9 (cos ≈ 1/9), far below ANN thresholds.
    val flipped = transform(col("embedding"),
      (v, i) => when(col("copy") === 0 ||
          pmod(xxhash64(col("vec_id"), i, col("copy")), lit(3)) =!= 0, v)
        .otherwise(-v))
    write(copies(emb).select(
      (col("vec_id") + col("copy") * kv).as("vec_id"),
      flipped.as("embedding"), col("label")),
      "embeddings", factor)

    println(s"[gendata] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
