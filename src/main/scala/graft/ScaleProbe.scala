package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Pair-family scale probe (r6 verdict item 7 / r7 item 1): runs the
  * four pair-emitting operators — ngram-Jaccard, SimHash,
  * embedding-cosine LSH, mutual-kNN — across GenData scale steps with
  * AUTO-scaled hyperplanes (nPlanes = 0, the library default; the
  * driver rows pin planes for oracle parity, which is exactly the knob
  * this probe exists to drop). The claim under test is AutoPlanesSpec's,
  * on real scaled corpora: with auto planes, candidate volume per
  * document stays flat as the corpus grows, so wall time scales
  * ~linearly where fixed planes went quadratic.
  *
  *   runMain graft.ScaleProbe <sfDir> [<sfDir> ...]
  *
  * One JSON line per (dir, op): wall seconds, result pair count, and
  * the derived plane count for the LSH ops. Dup injection mirrors the
  * driver rows' corpusWithDups/vecsWithDups (every 10th row reappears
  * as an exact/near copy) but with 10^8 id offsets: GenData's
  * copy-offset key strides reach ~10^6 at factor 100, where the driver
  * helpers' +10^5/+10^6 offsets would collide with real ids.
  */
object ScaleProbe {

  private val DupOff = 100000000L

  private def corpusWithDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base
      .union(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + DupOff).as("doc_id"), col("text")))
      .union(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2 * DupOff).as("doc_id"),
          concat(col("text"), lit(" graftdup")).as("text")))
  }

  private def vecsWithDups(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    base.union(
      base.where(col("vec_id") % 10 === 0).select(
        (col("vec_id") + DupOff).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.01)).cast("float"))
          .as("embedding")))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir> [<sfDir> ...]")
    val spark = GraftSession.get()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").collect() // warm-up off the clock

    def timeCount(df: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    args.foreach { dir =>
      val docs = corpusWithDups(
        spark.read.parquet(s"$dir/documents.parquet"))
        .localCheckpoint(true) // input materialized off every op's clock
      val vecs = vecsWithDups(
        spark.read.parquet(s"$dir/embeddings.parquet"))
        .localCheckpoint(true)
      val nVecs = vecs.count()
      val planes = operators.Similarity.autoPlanes(nVecs)

      val probes: Seq[(String, () => DataFrame, Int)] = Seq(
        ("d_dedup_ngram",
          () => operators.Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8), -1),
        ("d_dedup_simhash",
          () => operators.Dedup.simhashPairs(docs, maxHamming = 3), -1),
        ("d_dedup_embedding",
          () => operators.Dedup.embeddingCosinePairs(
            vecs, threshold = 0.9, knownCount = nVecs), planes),
        ("s_mutual_knn",
          () => operators.Similarity.mutualKnn(
            vecs, k = 5, knownCount = nVecs), planes))

      probes.foreach { case (name, mk, pl) =>
        val (wall, pairs) = timeCount(mk())
        val planesJson = if (pl >= 0) s""","auto_planes":$pl""" else ""
        println(s"""{"probe":"$name","sf":"$dir","wall_sec":$wall,"pairs":$pairs$planesJson}""")
      }
    }
    spark.stop()
  }
}
