package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Java-callable facade over the `native` kernels for generated code:
  * `native` is a Java reserved word, so Janino cannot parse
  * `graft.functions.native.polyHash(...)` — the doGenCode emitters call
  * `graft.functions.Kernels.*` (static forwarders) instead.
  */
object Kernels {
  def polyHash(s: String): Long = native.polyHash(s)
  def contentHash60(s: String): Long = native.contentHash60(s)
  def tokenCount(s: String): Int = native.tokenOffsets(s).length / 2
  def pieceCount(s: String): Int = native.pieceCount(s)
  def charEntropy(s: String): Double = native.charEntropy(s)
  def avgHash64(b: Array[Byte]): Long = native.avgHash64(b)
  def shingleHashes(s: String, n: Int): Array[Long] = native.shingleHashes(s, n)
  def shingleHashes(s: String, n: Int, wide: Boolean): Array[Long] =
    native.shingleHashes(s, n, wide)
  def positionalWindowHashes(s: String, n: Int): Array[Long] =
    native.positionalWindowHashes(s, n)
  def positionalWindowHashes(s: String, n: Int, wide: Boolean): Array[Long] =
    native.positionalWindowHashes(s, n, wide)
  def minHashSig(shingles: ArrayData, k: Int): Array[Long] = native.minHashSig(shingles, k)
  def simHash64(s: String): Long = native.simHash64(s)
  def hyperplaneBucket(vec: ArrayData, isDouble: Boolean, nPlanes: Int, seed: Int): Long =
    native.hyperplaneBucket(vec, isDouble, nPlanes, seed)
  def hashEmbed(s: String, dim: Int): Array[Float] = native.hashEmbed(s, dim)
  def cosine(a: ArrayData, aDouble: Boolean, b: ArrayData, bDouble: Boolean): Double =
    native.cosine(a, aDouble, b, bDouble)
  def nearestCentroids(vec: ArrayData, vDouble: Boolean, cents: ArrayData,
                       cDouble: Boolean, probes: Int): Array[Long] =
    native.nearestCentroids(vec, vDouble, cents, cDouble, probes)
  def vocabHits(s: String, words: java.util.HashSet[String]): Long =
    native.vocabHits(s, words)
  def bestLabel(s: String, groups: Array[(String, java.util.HashSet[String])],
                fallback: String): String =
    native.bestLabel(s, groups, fallback)
  def keywordsTopK(s: String, vocab: Array[String],
                   index: java.util.HashMap[String, Integer], k: Int): Array[UTF8String] =
    native.keywordsTopK(s, vocab, index, k)
  def bpeEncodeWord(s: String,
                    ranks: java.util.HashMap[String, Integer]): Array[UTF8String] =
    native.bpeEncodeWord(s, ranks)
  def tokenPolyHashes(s: String): Array[Long] = native.tokenPolyHashes(s)
  def pqEncode(emb: ArrayData, isDouble: Boolean,
               books: Array[Array[Array[Float]]]): Array[Int] =
    native.pqEncode(emb, isDouble, books)
  def pqAdc(q: ArrayData, isDouble: Boolean, codes: ArrayData,
            books: Array[Array[Array[Float]]]): Double =
    native.pqAdc(q, isDouble, codes, books)
  def sq8Cos(ea: ArrayData, eb: ArrayData, isDouble: Boolean,
             stats: ArrayData): Array[Double] =
    native.sq8Cos(ea, eb, isDouble, stats)
  def mmrSelect(cands: ArrayData, k: Int, lambda: Double): Array[Long] =
    native.mmrSelect(cands, k, lambda)
}
