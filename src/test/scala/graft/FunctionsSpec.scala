package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** Column-function primitives: hash portability, shingles, minhash,
  * simhash, vector math — each checked against an independent local
  * (plain-Scala) computation.
  */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def localHash(s: String): Long = {
    var acc = 0L
    for (c <- s) acc = (acc * 31 + c.toInt) % TextFunctions.HashMod
    acc
  }

  test("portableHash matches the local polynomial fold") {
    val inputs = Seq("", "a", "hello world", "ünïcödé £", "line\nbreak")
    val got = inputs.toDF("s")
      .select(TextFunctions.portableHash(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(got == inputs.map(localHash))
  }

  test("tokens splits on any whitespace, drops empties") {
    val got = Seq("  a\tb\n c  ").toDF("s")
      .select(TextFunctions.tokens(col("s"))).as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"))
  }

  test("wordShingles: n-grams, short text collapses to one shingle") {
    val got = Seq("a b c d", "a b").toDF("s")
      .select(TextFunctions.wordShingles(col("s"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("minHashSignature: identical sets → identical signatures; supersets differ") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps", "totally different words here now")
      .toDF("s").select(TextFunctions.minHashSignature(
        TextFunctions.shingleHashes(col("s"), 3), 16).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs.forall(_.length == 16))
  }

  test("lshBandKeys: equal signatures share all bands; near signatures share some") {
    val sig = Seq((1 to 16).map(_.toLong), (1 to 16).map(_.toLong))
    val keys = sig.toDF("sig")
      .select(TextFunctions.lshBandKeys(col("sig"), 16, 4).as("k"))
      .as[Seq[Long]].collect()
    assert(keys(0) == keys(1) && keys(0).length == 4)
    assert(keys(0).distinct.length == 4) // band index folded in → no cross-band collisions
  }

  test("simHash64 + hamming: near-identical texts land within small distance") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = Seq(base, base + " extra", "completely unrelated vocabulary set").toDF("s")
      .select(TextFunctions.simHash64(col("s")).as("h")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(df(0), df(1)) <= 6)
    assert(ham(df(0), df(2)) > 6)
  }

  test("jaccard on hashed shingle arrays") {
    val j = Seq(("a b c d e", "a b c d e x")).toDF("x", "y")
      .select(TextFunctions.jaccard(
        TextFunctions.shingleHashes(col("x"), 3),
        TextFunctions.shingleHashes(col("y"), 3)).as("j"))
      .as[Double].head()
    // x: 3 shingles, y: 4 shingles, 3 shared → 3/4
    assert(math.abs(j - 0.75) < 1e-12)
  }

  test("dot/l2norm/cosine against local math") {
    val a = Array(1.0f, 2.0f, 2.0f)
    val b = Array(2.0f, 0.0f, 0.0f)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.cosine(col("a"), col("b")).as("c"),
        VectorFunctions.cosine(col("a"), array(lit(0.0f), lit(0.0f), lit(0.0f))).as("z"))
      .head()
    assert(row.getDouble(0) == 2.0)
    assert(math.abs(row.getDouble(1) - 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(row.getDouble(2) == 0.0) // zero-vector guard
  }

  test("hashEmbed: unit norm, deterministic, bucket counts correct") {
    val got = Seq("x x y", "x x y", "").toDF("s")
      .select(VectorFunctions.hashEmbed(col("s"), 8).as("e")).as[Seq[Float]].collect()
    assert(got(0) == got(1))
    assert(got(0).length == 8)
    val norm = math.sqrt(got(0).map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(got(2).forall(_ == 0.0f)) // empty text → zero vector
    // matches the Scala-side twin used by the semantic chunker
    val twin = graft.operators.Chunkers.embed("x x y", 8).map(_.toFloat)
    assert(got(0).zip(twin).forall { case (u, v) => math.abs(u - v) < 1e-6 })
  }

  test("hyperplaneBucket: deterministic and within range") {
    val vecs = Seq(Array(1.0f, 0.5f, -0.3f, 0.9f), Array(1.0f, 0.5f, -0.3f, 0.9f),
      Array(-1.0f, -0.5f, 0.3f, -0.9f))
    val got = vecs.toDF("v")
      .select(VectorFunctions.hyperplaneBucket(col("v"), 4, 8).as("b")).as[Long].collect()
    assert(got(0) == got(1))
    assert(got.forall(b => b >= 0 && b < 256))
    // negated vector flips every plane with nonzero projection → different bucket
    assert(got(0) != got(2))
  }

  test("misraGries: heavy items survive any partitioning when vocab >> k") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // 3 heavy tokens (1200 each) buried in 5000 distinct singletons:
    // N = 8600, k = 16 → guarantee threshold N/17 ≈ 506 << 1200.
    // 64 partitions force real partial buffers + merges.
    val heavy = Seq("alpha", "beta", "gamma").flatMap(t => Seq.fill(1200)(t))
    val noise = (0 until 5000).map(i => s"n$i")
    val df = spark.sparkContext.parallelize(
      scala.util.Random.shuffle(heavy ++ noise), 64).toDF("tok")
    val sweep = df.agg(
      graft.functions.MisraGriesAgg.misraGries(col("tok"), 16).as("cands"),
      count(lit(1)).as("nt")).head()
    val cands = sweep.getSeq[String](0).toSet
    assert(sweep.getLong(1) == 8600L)
    assert(cands.size <= 16, s"summary exceeded k: ${cands.size}")
    assert(Set("alpha", "beta", "gamma").subsetOf(cands),
      s"heavy items lost from $cands")
  }
}
