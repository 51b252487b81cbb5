package graft

import graft.functions.native
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based equivalence between the native kernels and
  * independent reference models (BigInt folds / plain Scala
  * collections) over arbitrary unicode text, including supplementary
  * code points and every ASCII whitespace the tokenizer recognizes.
  * The sample-based specs pin exact values; these pin the ALGEBRA —
  * any divergence between a fused kernel and its definition is a
  * silent oracle break, which is exactly what a generator finds first.
  */
object KernelPropsSpec extends Properties("native-kernels") {

  private val P = BigInt(1000000007L)
  private val P2 = BigInt(998244353L)

  // valid unicode text: ASCII words, accented/CJK chars, supplementary
  // code points (surrogate pairs), and all six ASCII whitespace chars
  private val codepoint: Gen[Int] = Gen.frequency(
    6 -> Gen.choose('a'.toInt, 'z'.toInt),
    2 -> Gen.choose('0'.toInt, '9'.toInt),
    1 -> Gen.oneOf('é'.toInt, 'ß'.toInt, '漢'.toInt, 'щ'.toInt),
    1 -> Gen.oneOf(0x1F600, 0x10348, 0x2070E), // supplementary planes
    3 -> Gen.oneOf(' '.toInt, '\t'.toInt, '\n'.toInt, 0x0B, '\f'.toInt, '\r'.toInt),
    1 -> Gen.oneOf('.'.toInt, ','.toInt, '!'.toInt, '-'.toInt, '_'.toInt, '('.toInt)
  )
  private val text: Gen[String] =
    Gen.listOf(codepoint).map(_.flatMap(Character.toChars(_)).mkString)

  private def modelTokens(s: String): List[String] =
    s.split("[ \t\n\u000B\f\r]+").toList.filter(_.nonEmpty)

  private def modelHash(s: String): Long =
    s.codePoints().toArray.foldLeft(BigInt(0))((a, c) => (a * 31 + c) mod P).toLong

  private def modelHash2(s: String): Long =
    s.codePoints().toArray.foldLeft(BigInt(0))((a, c) => (a * 131 + c) mod P2).toLong

  private val P3 = BigInt(1000000009L)

  private def modelHash3(s: String): Long =
    s.codePoints().toArray.foldLeft(BigInt(0))((a, c) => (a * 257 + c) mod P3).toLong

  // simhash token hash: low-20-bit slices of three families (per-bit
  // uniform); the span/window combiner h31 * P2 + h131 stays separate
  private def modelTokenHash60(tok: String): Long =
    (modelHash(tok) & 0xFFFFFL) |
      ((modelHash2(tok) & 0xFFFFFL) << 20) |
      ((modelHash3(tok) & 0xFFFFFL) << 40)

  property("polyHash == BigInt codepoint fold") = forAll(text) { s =>
    native.polyHash(s) == modelHash(s)
  }

  property("contentHash60 == h31*P2 + h131 whole-string fold") = forAll(text) { s =>
    native.contentHash60(s) == modelHash(s) * P2.toLong + modelHash2(s)
  }

  // independent histogram via Java code-point stream + groupBy; the
  // fold order (ascending code point) is part of the kernel's contract
  // with the DuckDB oracle, so the model replays it exactly
  property("charEntropy == sorted-codepoint histogram fold") = forAll(text) { s =>
    val cps = s.codePoints().toArray
    val model =
      if (cps.isEmpty) 0.0
      else {
        val n = cps.length.toDouble
        cps.toSeq.groupBy(identity).toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (h, (_, g)) =>
            val p = g.size / n
            h - p * math.log(p)
          }
      }
    native.charEntropy(s) == model
  }

  // the definitional two-regex formulation the native scan replaced:
  // ASCII-alnum runs + code points outside [A-Za-z0-9\s]
  property("pieceCount == alnum-run split + regex-strip remainder") = forAll(text) { s =>
    val runs = s.split("[^A-Za-z0-9]+").count(_.nonEmpty)
    val rest = s.replaceAll("[A-Za-z0-9\\s]", "")
    native.pieceCount(s) == runs + rest.codePointCount(0, rest.length)
  }

  property("tokenOffsets slices == regex whitespace split") = forAll(text) { s =>
    val offs = native.tokenOffsets(s)
    val toks = offs.grouped(2).map(p => s.substring(p(0), p(1))).toList
    toks == modelTokens(s)
  }

  property("tokenPolyHashes == per-token BigInt fold of the regex split") =
    forAll(text) { s =>
      native.tokenPolyHashes(s).toList == modelTokens(s).map(modelHash)
    }

  // PQ kernels vs a plain-Scala model with the SAME association order
  // (per-subspace subtotal summed left-to-right, doubles throughout) —
  // the fold-order parity the oracle hash gate rests on
  private val pqVec: Gen[(Array[Float], Array[Array[Array[Float]]])] = for {
    m <- Gen.choose(1, 4)
    sub <- Gen.choose(1, 4)
    nCodes <- Gen.choose(1, 5)
    emb <- Gen.listOfN(m * sub, Gen.choose(-8, 8).map(_.toFloat / 4f))
    books <- Gen.listOfN(m, Gen.listOfN(nCodes,
      Gen.listOfN(sub, Gen.choose(-8, 8).map(_.toFloat / 4f))))
  } yield (emb.toArray, books.map(_.map(_.toArray).toArray).toArray)

  private def modelL2sq(a: Array[Float], off: Int, b: Array[Float]): Double = {
    var s = 0.0
    for (j <- b.indices) { val d = a(off + j).toDouble - b(j).toDouble; s += d * d }
    s
  }

  property("pqEncode == first-argmin of per-subspace L2 folds") = forAll(pqVec) {
    case (emb, books) =>
      val got = native.pqEncode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(emb),
        false, books)
      val want = books.indices.map { mi =>
        val sub = books(mi)(0).length
        val d = books(mi).map(e => modelL2sq(emb, mi * sub, e))
        d.indexOf(d.min)
      }
      got.toSeq == want
  }

  property("pqAdc == subspace-ordered sum of coded-entry L2 folds") = forAll(pqVec) {
    case (emb, books) =>
      val codes = books.indices.map(mi =>
        (emb(0).abs * 100).toInt % books(mi).length).toArray
      val got = native.pqAdc(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(emb), false,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(codes), books)
      var want = 0.0
      for (mi <- books.indices) {
        val sub = books(mi)(0).length
        want += modelL2sq(emb, mi * sub, books(mi)(codes(mi)))
      }
      got == want
  }

  // sq8Cos vs a plain-Scala model replicating the HOF chain it
  // replaced: separate left-to-right folds for each accumulator,
  // Spark's exact double round (BigDecimal.valueOf + HALF_UP) in the
  // dequantize, mx==mn pass-through, and sqrt-before-product zero
  // guard. Bit-exact equality (== on doubles), not approximate.
  private val sq8Vec: Gen[(Array[Float], Array[Float], Array[Double], Array[Double])] =
    for {
      dim <- Gen.choose(1, 8)
      ea <- Gen.listOfN(dim, Gen.choose(-16, 16).map(_.toFloat / 4f))
      eb <- Gen.listOfN(dim, Gen.choose(-16, 16).map(_.toFloat / 4f))
      // bounds: sometimes degenerate (mn == mx), sometimes real
      mns <- Gen.listOfN(dim, Gen.choose(-5, 0).map(_.toDouble))
      spans <- Gen.listOfN(dim, Gen.frequency(1 -> Gen.const(0.0),
        4 -> Gen.choose(1, 10).map(_.toDouble)))
    } yield (ea.toArray, eb.toArray, mns.toArray,
      mns.zip(spans).map { case (m, s) => m + s }.toArray)

  private def modelRound0(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  private def modelDq(e: Array[Float], mns: Array[Double], mxs: Array[Double]): Array[Double] =
    e.indices.map { i =>
      val x = e(i).toDouble
      if (mxs(i) == mns(i)) x
      else mns(i) + modelRound0((x - mns(i)) * 255 / (mxs(i) - mns(i))) *
        (mxs(i) - mns(i)) / 255
    }.toArray

  private def modelCos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) dot += a(i) * b(i)
    for (i <- a.indices) na += a(i) * a(i)
    for (i <- b.indices) nb += b(i) * b(i)
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa * sb == 0) 0.0 else dot / (sa * sb)
  }

  property("sq8Cos == (full cosine, dequantized cosine) HOF folds") =
    forAll(sq8Vec) { case (ea, eb, mns, mxs) =>
      val got = native.sq8Cos(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ea),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(eb),
        false,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(mns ++ mxs))
      val wantFull = modelCos(ea.map(_.toDouble), eb.map(_.toDouble))
      val wantSq8 = modelCos(modelDq(ea, mns, mxs), modelDq(eb, mns, mxs))
      got.length == 2 && got(0) == wantFull && got(1) == wantSq8
    }

  property("shingleHashes == distinct space-joined window hashes (with <n fallback)") =
    forAll(text, Gen.choose(1, 5)) { (s, n) =>
      val toks = modelTokens(s)
      val expected =
        if (toks.length < n) List(modelHash(toks.mkString(" ")))
        else toks.sliding(n).map(w => modelHash(w.mkString(" "))).toList.distinct
      native.shingleHashes(s, n).toList == expected
    }

  property("positionalWindowHashes == per-offset window hashes, no dedup") =
    forAll(text, Gen.choose(1, 5)) { (s, n) =>
      val toks = modelTokens(s)
      val expected =
        if (toks.length < n) Nil
        else toks.sliding(n).map(w => modelHash(w.mkString(" "))).toList
      native.positionalWindowHashes(s, n).toList == expected
    }

  private def modelHash60(s: String): Long =
    modelHash(s) * P2.toLong + modelHash2(s)

  property("wide shingleHashes == distinct h31*P2+h131 window hashes (with <n fallback)") =
    forAll(text, Gen.choose(1, 5)) { (s, n) =>
      val toks = modelTokens(s)
      val expected =
        if (toks.length < n) List(modelHash60(toks.mkString(" ")))
        else toks.sliding(n).map(w => modelHash60(w.mkString(" "))).toList.distinct
      native.shingleHashes(s, n, wide = true).toList == expected
    }

  property("wide positionalWindowHashes == per-offset h31*P2+h131 hashes") =
    forAll(text, Gen.choose(1, 5)) { (s, n) =>
      val toks = modelTokens(s)
      val expected =
        if (toks.length < n) Nil
        else toks.sliding(n).map(w => modelHash60(w.mkString(" "))).toList
      native.positionalWindowHashes(s, n, wide = true).toList == expected
    }

  property("simHash64 == per-bit vote model over dual-polynomial token hashes") =
    forAll(text) { s =>
      val votes = new Array[Int](60)
      for (tok <- modelTokens(s); h = modelTokenHash60(tok); bit <- 0 until 60)
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
      val expected = (0 until 60).foldLeft(0L)((acc, bit) =>
        if (votes(bit) > 0) acc | (1L << bit) else acc)
      native.simHash64(s) == expected
    }

  property("simHash64 is whitespace-normalization invariant") = forAll(text) { s =>
    native.simHash64(s) == native.simHash64(modelTokens(s).mkString("\n"))
  }

  property("hashEmbed: L2-normalized token-bucket histogram") =
    forAll(text, Gen.oneOf(4, 16, 64)) { (s, dim) =>
      val counts = new Array[Double](dim)
      for (tok <- modelTokens(s)) counts((modelHash(tok) % dim).toInt) += 1.0
      val norm = math.sqrt(counts.map(c => c * c).sum)
      val expected =
        if (norm == 0) new Array[Float](dim)
        else counts.map(c => (c / norm).toFloat)
      native.hashEmbed(s, dim).toSeq == expected.toSeq
    }

  property("minHashSig: element i is the min affine re-hash over the shingle set") = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L)), Gen.choose(1, 16)) { (sh, k) =>
      val got = native.minHashSig(new GenericArrayData(sh.toArray), k).toList
      val expected = (0 until k).map { i =>
        val a = BigInt(2L * i + 1)
        val b = (BigInt(12582917L) * (i + 1)) mod P
        sh.map(x => ((BigInt(x) * a + b) mod P).toLong).min
      }.toList
      got == expected
    }
  }

  property("nearestCentroids picks by (cosine desc, list_id asc)") = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    val vec = Gen.listOfN(4, Gen.choose(-5, 5)).map(_.map(_.toFloat).toArray)
    forAll(vec, Gen.nonEmptyListOf(vec), Gen.choose(1, 4)) { (q, cents, probes) =>
      val ids = cents.indices.map(_.toLong * 7) // non-dense ids
      val arr = new GenericArrayData(cents.zip(ids).map { case (c, id) =>
        InternalRow(id, new GenericArrayData(c))
      }.toArray[Any])
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0) 0.0 else d / den
      }
      val expected = cents.zip(ids)
        .map { case (c, id) => (id, cos(q, c)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(math.min(probes, cents.length))
        .map(_._1)
      val got = native.nearestCentroids(
        new GenericArrayData(q), false, arr, false, probes).toList
      got == expected
    }
  }

  property("bpeEncodeWord: pieces concatenate back to the word; fixpoint has no learned pair") = {
    val sym = Gen.oneOf("a", "b", "c", "d")
    val word = Gen.listOfN(8, sym).map(_.mkString)
    val merge = Gen.zip(sym, sym)
    forAll(word, Gen.listOfN(4, merge)) { (w, merges) =>
      val ranks = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        ranks.putIfAbsent(a + " " + b, i)
      }
      val pieces = native.bpeEncodeWord(w, ranks).map(_.toString)
      val rebuilt = pieces.mkString == w
      val fixpoint = pieces.length < 2 || pieces.sliding(2).forall(p =>
        !ranks.containsKey(p(0) + " " + p(1)))
      rebuilt && fixpoint && pieces.forall(_.nonEmpty)
    }
  }

  property("mmrSelect: a permutation-free subset of the pool, first pick = argmax rel") = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    val emb = Gen.listOfN(4, Gen.choose(-3, 3)).map(_.map(_.toFloat).toArray)
    val cand = Gen.zip(Gen.choose(0L, 50L), Gen.choose(-100, 100), emb)
    forAll(Gen.nonEmptyListOf(cand), Gen.choose(1, 6)) { (cs0, k) =>
      val cs = cs0.distinctBy(_._1) // unique ids (pool ids are unique by construction)
      val arr = new GenericArrayData(cs.map { case (id, rel, e) =>
        InternalRow(id, rel / 100.0, new GenericArrayData(e))
      }.toArray[Any])
      val got = native.mmrSelect(arr, k, 0.7).toList
      val ids = cs.map(_._1).toSet
      val firstExpected = cs.map(t => (t._1, t._2 / 100.0))
        .sortBy { case (id, rel) => (-rel, id) }.head._1
      got.length == math.min(k, cs.length) &&
        got.toSet.size == got.length &&
        got.forall(ids.contains) &&
        got.head == firstExpected
    }
  }

  // fuzzyEditPairs' documented recall contract, as pure slice algebra
  // (the Spark operator applies exactly this segmentation:
  // substring(head, slot*width+1, width), empty slices filtered).
  // Pigeonhole: ≤ maxDist substitutions with more nonempty slices
  // than maxDist MUST leave one shared nonempty slice — if this ever
  // fails, the blocking join silently loses guaranteed pairs.
  property("fuzzy blocking: ≤2 substitutions leave a shared slice when ≥3 slices are filled") = {
    val headLen = 64; val segments = 3; val width = headLen / segments
    def slices(s: String): Seq[(Int, String)] =
      (0 until segments).map(i => i -> s.slice(i * width, i * width + width))
        .filter(_._2.nonEmpty)
    val baseGen = for {
      n <- Gen.choose(2 * width + 1, 80) // head fills all 3 slices
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString
    forAll(baseGen, Gen.choose(0, 63), Gen.choose(0, 63)) { (base, p1, p2) =>
      val head = base.take(headLen)
      val edited = head.toCharArray
      for (p <- Seq(p1, p2) if p < edited.length) edited(p) = 'Z'
      val eh = new String(edited)
      val shared = slices(head).toSet.intersect(slices(eh).toSet)
      shared.nonEmpty
    }
  }
}
