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
  *    bigger one. Copy i > 0 rewrites every third token (position +
  *    copy keyed), dropping cross-copy 3-gram Jaccard and minhash
  *    similarity well below every dedup threshold — pair density per
  *    document stays that of sf0.1 (the corpusWithDups-injected dups),
  *    volume grows linearly.
  *  - embeddings: copy i > 0 sign-flips ~1/3 of coordinates (deterministic
  *    in (vec_id, dim, copy)), pushing cross-copy cosine far below
  *    near-dup/ANN thresholds for the same reason.
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

    // rewrite every third token, keyed on (position, doc_id, copy);
    // copy 0 is the original text
    val perturbed = transform(split(col("text"), "\\s+"),
      (tok, i) => when(col("copy") === 0 || (i + col("doc_id") + col("copy")) % 3 =!= 0, tok)
        .otherwise(concat(tok, lit("~"), col("copy"))))
    write(copies(docs).select(
      (col("doc_id") + col("copy") * kd).as("doc_id"),
      array_join(perturbed, " ").as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", factor)

    // sign-flip dims where (vec_id + dim·31 + copy·17) % 3 == 0
    val flipped = transform(col("embedding"),
      (v, i) => when(col("copy") === 0 || (col("vec_id") + i * 31 + col("copy") * 17) % 3 =!= 0, v)
        .otherwise(-v))
    write(copies(emb).select(
      (col("vec_id") + col("copy") * kv).as("vec_id"),
      flipped.as("embedding"), col("label")),
      "embeddings", factor)

    println(s"[gendata] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
