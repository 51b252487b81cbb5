package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination, training-sequence packing, stratified mixing.
  * Like the dedup family, nothing here ever needs a global pass — each
  * operator shuffles once on a derived key (shingle hash, shard id,
  * stratum) and is deterministic/RNG-free so a re-run over 100 TB
  * produces byte-identical output.
  */
object Corpus {

  /** Benchmark decontamination: flag corpus documents sharing at least
    * one n-gram with a held-out benchmark/eval set (the standard
    * GPT-3/Llama-style contamination check). Returns (doc_id, n_shared)
    * for contaminated documents — callers anti-join to drop them.
    *
    * Shape: both sides reduce to distinct n-gram hashes (map-only),
    * join on the hash — the benchmark side is tiny in practice (eval
    * sets are MBs against a 100 TB corpus) so AQE broadcasts it; no
    * hint, so a pathological giant "benchmark" degrades to a shuffle
    * join instead of failing at the broadcast cap. Corpus text never
    * shuffles: only (doc_id, shingle-hash) longs. Hashes are the
    * ~60-bit dual-polynomial family (wide = true): a match DROPS a
    * document, so at 10^8+ corpus shingles a ~30-bit hash would
    * birthday-collide into false contamination flags.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val corpusShingles = corpus.select(
      col("doc_id"),
      explode(graft.functions.native.shingleHashes(col("text"), n, wide = true))
        .as("shingle"))
    val benchShingles = benchmark
      .select(explode(graft.functions.native.shingleHashes(col("text"), n, wide = true))
        .as("shingle"))
      .distinct()
    corpusShingles
      .join(benchShingles, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
      .select(col("doc_id"), col("n_shared"))
  }

  /** Pack documents into fixed-token-budget training sequences — the
    * canonical pre-training packing step. Documents are laid out
    * end-to-end in (shard, doc_id) order; each token offset range maps
    * to sequence ids, and a document reports the first/last sequence it
    * occupies (documents straddle boundaries, as packed pre-training
    * does).
    *
    * Scale design: packing is NOT a global window (a single
    * unpartitioned cumsum would serialize 100 TB through one task).
    * Documents are sharded by a portable content-id hash; each shard
    * packs independently — embarrassingly parallel, one shuffle on the
    * shard id, and sequence ids are namespaced per shard. Deterministic:
    * same corpus → same sequences on any cluster size.
    */
  def packSequences(docs: DataFrame, tokensPerSeq: Int = 2048,
                    nShards: Int = 256): DataFrame = {
    require(tokensPerSeq > 0 && nShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), graft.functions.native.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("shard",
        pmod(TextFunctions.portableHash(col("doc_id").cast("string")), lit(nShards)).cast("int"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      // token span [cum - n_tok, cum) → sequences [start_seq, end_seq]
      .withColumn("start_seq", expr(s"(cum - n_tok) div $tokensPerSeq"))
      .withColumn("end_seq", expr(s"(cum - 1) div $tokensPerSeq"))
      .where(col("n_tok") > 0)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("cum"),
        col("start_seq"), col("end_seq"))
  }

  /** First-fit-decreasing bin packing of documents into fixed
    * token-budget bins — the padding-minimizing alternative to
    * [[packSequences]]' sequential layout (sequential packing splits
    * documents across sequence boundaries; bin packing keeps each
    * document whole and minimizes the padding a whole-document batch
    * pays, the trade used for instruction-tuning data). FFD within a
    * shard: documents sorted (n_tok desc, doc_id), each placed in the
    * FIRST bin it fits; no fit → a new bin (a document over the
    * budget gets a bin of its own). Output (doc_id, shard, n_tok,
    * bin), bin ids 0-based per shard.
    *
    * Scale shape: same as [[packSequences]] — one shuffle on the
    * content-hash shard id, each shard packs independently
    * (flatMapGroups: packing is a genuinely sequential fold, the
    * documented last-resort case for typed imperative logic; state
    * is one long per open bin, shard-bounded). Deterministic: total
    * order (n_tok desc, doc_id) and first-fit are RNG-free, so the
    * same corpus packs identically on any cluster size.
    */
  def packBins(docs: DataFrame, tokensPerBin: Int = 2048,
               nShards: Int = 256): DataFrame = {
    require(tokensPerBin > 0 && nShards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        graft.functions.native.tokenCount(col("text")).cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
      .withColumn("shard",
        pmod(TextFunctions.portableHash(col("doc_id").cast("string")), lit(nShards)).cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val ds = it.toArray.sortBy(t => (-t._2, t._1))
        val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.iterator.map { case (docId, nTok, _) =>
          val idx = bins.indexWhere(_ + nTok <= tokensPerBin)
          val bin =
            if (idx < 0) { bins += nTok; bins.length - 1 }
            else { bins(idx) += nTok; idx }
          (docId, shard, nTok, bin)
        }
      }
      .toDF("doc_id", "shard", "n_tok", "bin")
  }

  /** Repeated-span detection — exact substring-level duplication, the
    * span-granular complement of the document-level near-dup family
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better": memorized boilerplate repeats as long verbatim spans
    * inside otherwise-distinct documents). Finds n-token windows whose
    * hash occurs in ≥ `minDocs` distinct documents and merges each
    * document's flagged window offsets into maximal spans. Output:
    * (doc_id, span_start, span_end, n_hits) in token coordinates
    * (inclusive ends) — callers cut or down-weight the spans.
    *
    * Scale shape: positional window hashes are a narrow per-row
    * expression; the only corpus-sized shuffle is the groupBy(hash)
    * document-frequency aggregate over (hash, doc_id, pos) longs (raw
    * text never shuffles). The hot-hash set — actual repeated spans —
    * is tiny relative to the corpus, so the flagging semi-join
    * broadcasts under AQE (no hint: a boilerplate-heavy corpus degrades
    * to a shuffle join instead of failing at the broadcast cap). The
    * window pipeline deliberately re-executes for the probe side
    * instead of being checkpointed: it is corpus-token-proportional
    * (one row per token), and a second narrow scan is cheaper than
    * materializing it — the opposite trade from the (pair-sized) ngram
    * checkpoint. Island merging then runs on flagged rows only.
    */
  def repeatedSpans(documents: DataFrame, n: Int = 8,
                    minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2, "n > 0; minDocs >= 2 (cross-document repetition)")
    // native one-pass kernel; wide (~60-bit dual-polynomial) hashes
    // because a false hash match here gets CUT out of the corpus by
    // cutSpans — at 10^8+ windows a single ~30-bit family would
    // birthday-collide into millions of destructive false spans. Still
    // bit-reproducible in ANSI SQL (the DuckDB oracle computes
    // h31 * 998244353 + h131 with two list_reduce folds).
    val windows = documents
      .select(col("doc_id"), posexplode(
        graft.functions.native.positionalWindowHashes(col("text"), n, wide = true))
        .as(Seq("pos", "h")))
    val hot = windows.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("h"))
    mergeSpans(windows.join(hot, Seq("h"), "left_semi"), n)
  }

  /** Span-level benchmark decontamination: flag the exact token spans
    * of corpus documents that overlap a held-out eval set's n-grams —
    * the surgical variant of [[decontaminate]] (drop the contaminated
    * SPAN, keep the document; whole-document drops throw away good
    * tokens when contamination is one quoted benchmark item). Same
    * scale shape as [[repeatedSpans]]: the eval side reduces to
    * distinct n-gram hashes (tiny → AQE broadcasts the semi-join), the
    * corpus side is a narrow positional-window-hash scan, and island
    * merging runs on flagged rows only. Output: (doc_id, span_start,
    * span_end, n_hits), token coordinates, inclusive ends.
    *
    * Hashes are wide (~60-bit) — see [[repeatedSpans]]; the flagged
    * spans are destined for [[cutSpans]].
    *
    * Minimum-length contract: benchmark items with fewer than `n`
    * tokens are NOT detectable at span granularity (there is no
    * n-token window to match) and are excluded here rather than
    * silently hashed under shingleHashes' whole-text fallback, which
    * can never equal an n-token corpus window and would only add
    * collision surface. Screen short eval items separately with
    * [[decontaminate]] (whole-doc n-grams share the same fallback on
    * both sides, so a short benchmark item can still exact-match an
    * equally short document there).
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
                         n: Int = 8): DataFrame = {
    val windows = corpus.select(col("doc_id"), posexplode(
      graft.functions.native.positionalWindowHashes(col("text"), n, wide = true))
      .as(Seq("pos", "h")))
    // positional windows on the benchmark side too: an item with < n
    // tokens yields an empty array (the documented exclusion) instead
    // of shingleHashes' whole-text fallback hash
    val benchHashes = benchmark
      .select(explode(
        graft.functions.native.positionalWindowHashes(col("text"), n, wide = true))
        .as("h"))
      .distinct()
    mergeSpans(windows.join(benchHashes, Seq("h"), "left_semi"), n)
  }

  /** Apply span cuts: remove the flagged token ranges (inclusive ends,
    * token coordinates — the output shape of [[repeatedSpans]] /
    * [[decontaminateSpans]]) from each document. Documents with no
    * spans pass through with their text rebuilt from tokens the same
    * way (single-space joined), so the output column is uniformly
    * whitespace-normalized. Narrow: the span sets aggregate to one tiny
    * row per FLAGGED doc (spans ≪ corpus), the join broadcasts under
    * AQE, and the cut itself is a per-row HOF filter over indexed
    * tokens — no corpus shuffle.
    */
  def cutSpans(documents: DataFrame, spans: DataFrame): DataFrame = {
    val spanSets = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(
        col("span_start").as("a"), col("span_end").as("b"))).as("cuts"))
    val toks = TextFunctions.tokens(col("text"))
    val kept = filter(
      transform(col("t"), (tok, i) =>
        when(!exists(col("cuts"), c => i >= c("a") && i <= c("b")), tok)),
      x => x.isNotNull)
    documents
      .join(spanSets, Seq("doc_id"), "left")
      .select(col("doc_id"), toks.as("t"), coalesce(col("cuts"), array()).as("cuts"))
      .select(col("doc_id"),
        array_join(kept, " ").as("text"),
        (size(col("t")) - size(kept)).as("n_removed"))
  }

  /** C4-style line-level dedup (Raffel et al., "Exploring the Limits
    * of Transfer Learning", §2.2): cut every line that occurs in at
    * least `minDocs` DISTINCT documents — the canonical boilerplate
    * remover (nav bars, cookie banners, license headers) that
    * document-level dedup can't touch and token-window spans only
    * catch when the boilerplate is long. Returns every document,
    * cleaned, with n_removed; line order is preserved.
    *
    * Keys are the line STRINGS, deliberately not hashes: a cut is
    * destructive, and at 10^10+ distinct lines a narrow hash would
    * birthday-collide good lines into the boilerplate set (the same
    * false-cut reasoning that moved the span family to 60-bit
    * hashes — here lines are short enough to ship whole). Scale
    * shape: the doc-frequency aggregate shuffles distinct (line,
    * doc_id) pairs map-side combined; the hot set (lines in ≥
    * minDocs docs) is vanishingly small and AQE broadcasts it back
    * onto the exploded lines, so only FLAGGED (doc_id, pos) rows
    * reach the per-doc cut-list aggregate; the cut itself is a
    * map-side HOF over the re-split text, mirroring [[cutSpans]].
    */
  def dedupLines(documents: DataFrame, minDocs: Int = 3): DataFrame = {
    val lines = documents.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val hot = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs).select(col("line"))
    val cuts = lines.join(hot, Seq("line"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cut_pos"))
    documents
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), split(col("text"), "\n").as("ls"),
        coalesce(col("cut_pos"), array().cast("array<int>")).as("cut_pos"))
      .select(col("doc_id"),
        array_join(filter(col("ls"),
          (l, i) => !array_contains(col("cut_pos"), i)), "\n").as("text"),
        size(col("cut_pos")).as("n_removed"))
  }

  /** Merge flagged window offsets into maximal spans (gaps-and-islands
    * over (doc_id, pos) rows): flagged positions p1 < p2 cover
    * contiguous tokens iff p2 - p1 <= n.
    */
  private def mergeSpans(flagged: DataFrame, n: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("newIsland",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > n, 1).otherwise(0))
      .withColumn("island", sum(col("newIsland")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("max_pos"),
        count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("span_start"),
        (col("max_pos") + n - 1).as("span_end"), col("n_hits"))
  }

  /** BPE merge training (Sennrich et al., "Neural Machine Translation
    * of Rare Words with Subword Units") — the tokenizer-training step
    * of a training-data pipeline, in the canonical distributed shape:
    * ONE corpus pass reduces 100 TB of text to a vocab-bounded word
    * frequency table (map-side combined), and every merge iteration
    * then runs on that table alone — pair counting is an explode +
    * partial aggregate over ≤|vocab| rows, and the argmax pulls ONE
    * row to the driver (bounded, like a broadcast). Deterministic:
    * ties break on (pair count desc, a, b), so the learned merge list
    * is reproducible across runs and cluster sizes.
    */
  def bpeInitialSymbols(documents: DataFrame): DataFrame =
    documents
      .select(explode(TextFunctions.tokens(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(split(col("word"), "").as("syms"), col("cnt"))

  /** Adjacent-symbol pair counts over a (syms: array<string>, cnt)
    * table, weighted by word frequency — one BPE iteration's statistic.
    */
  def bpePairCounts(symbols: DataFrame): DataFrame =
    symbols
      .where(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("a"),
          element_at(col("syms"), i + 2).as("b")))).as("p"), col("cnt"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Learn `nMerges` BPE merges. Returns the merge list in order — the
    * tokenizer artifact. Stops early when the best pair drops under
    * `minPairCount`.
    *
    * Adaptive, like [[graft.operators.Dedup.connectedComponents]]'s
    * driver gate: after the one corpus pass, the symbol table is
    * vocab-bounded — for every real tokenizer run it is driver-sized
    * (a few million distinct words), and a real merge count is
    * 30k-100k, which as Spark jobs would schedule 60k+ stages over a
    * table that fits in memory. At or under `localVocabThreshold`
    * distinct words the merge loop runs locally (identical output:
    * same pair statistic, same total-order tie-break, same
    * leftmost-first rewrite — spec-asserted against the distributed
    * path); a pathological vocabulary larger than the driver takes the
    * distributed loop, each iteration checkpointing the rewritten
    * symbol table (truncating lineage like connectedComponents'
    * rounds) — the corpus is never touched again after the first pass
    * on either path.
    */
  def bpeMerges(documents: DataFrame, nMerges: Int,
                minPairCount: Long = 2,
                localVocabThreshold: Long = 4L << 20): Seq[(String, String)] = {
    val spark = documents.sparkSession
    import spark.implicits._
    var syms = bpeInitialSymbols(documents).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    if (syms.count() <= localVocabThreshold) {
      // driver path: O(1) Spark jobs in nMerges
      val words = syms.as[(Seq[String], Long)].collect()
        .map { case (s, c) => (s.toArray, c) }
      syms.unpersist()
      var continue = true
      while (continue && merges.length < nMerges) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((s, c) <- words; i <- 0 until s.length - 1)
          counts.updateWith((s(i), s(i + 1)))(v => Some(v.getOrElse(0L) + c))
        // same total-order argmax as the distributed orderBy:
        // (pair_count desc, a, b) — with a/b compared as UTF-8 bytes,
        // Spark's StringType sort order (Java String compareTo is
        // UTF-16 order, which disagrees above the BMP)
        def ltUtf8(x: String, y: String): Boolean = {
          val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = math.min(xb.length, yb.length)
          var i = 0
          while (i < n) {
            val c = (xb(i) & 0xff) - (yb(i) & 0xff)
            if (c != 0) return c < 0
            i += 1
          }
          xb.length < yb.length
        }
        def wins(x: ((String, String), Long), y: ((String, String), Long)): Boolean = {
          val ((xa, xb), xc) = x; val ((ya, yb), yc) = y
          if (xc != yc) xc > yc
          else if (xa != ya) ltUtf8(xa, ya)
          else ltUtf8(xb, yb)
        }
        val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
          case (None, kv) => Some(kv)
          case (acc @ Some(cur), kv) => if (wins(kv, cur)) Some(kv) else acc
        }
        best.filter(_._2 >= minPairCount) match {
          case Some(((a, b), _)) =>
            merges += ((a, b))
            var w = 0
            while (w < words.length) {
              val s = words(w)._1
              var hit = false
              var i = 0
              while (!hit && i < s.length - 1) { hit = s(i) == a && s(i + 1) == b; i += 1 }
              if (hit) {
                val out = scala.collection.mutable.ArrayBuffer.empty[String]
                var j = 0
                while (j < s.length) {
                  if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                    out += a + b; j += 2 // leftmost-first, non-overlapping
                  } else { out += s(j); j += 1 }
                }
                words(w) = (out.toArray, words(w)._2)
              }
              w += 1
            }
          case None => continue = false
        }
      }
      return merges.toSeq
    }
    var stopped = false
    for (_ <- 1 to nMerges if !stopped) {
      // argmax with total-order tie-break → reproducible merge list;
      // limit(1) is a TakeOrderedAndProject, one row to the driver
      val top = bpePairCounts(syms)
        .orderBy(col("pair_count").desc, col("a"), col("b")).limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minPairCount) match {
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val merged = syms.as[(Seq[String], Long)].map { case (s, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                out += a + b; i += 2 // leftmost-first, non-overlapping
              } else { out += s(i); i += 1 }
            }
            (out.toSeq, c)
          }.toDF("syms", "cnt").localCheckpoint(true)
          syms.unpersist()
          syms = merged
        case None => stopped = true
      }
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Apply a learned BPE merge list to the corpus — the encode half of
    * the tokenizer story ([[bpeMerges]] trains the list). Tokenizes
    * each document (lowercased whitespace words, the same
    * normalization as [[bpeInitialSymbols]]) and encodes every word by
    * the iterative min-rank procedure of the reference BPE encoders
    * (see [[graft.functions.native.bpeEncodeWord]]). Output one row
    * per (doc_id, word_idx) with the word and its pieces.
    *
    * Scale shape: map-only at any corpus size — the merge table is a
    * codegen reference object riding with the task binary (30k-100k
    * merges ≈ MBs, broadcast-sized by construction), the explode is
    * word-proportional, and nothing shuffles.
    */
  def bpeEncode(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    documents
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("word_idx", "word")))
      .select(col("doc_id"), col("word_idx"), col("word"),
        graft.functions.native.bpeEncode(col("word"), merges).as("pieces"))

  /** Tokenizer fertility per group (avg BPE pieces per word) — the
    * standard tokenizer-evaluation metric (e.g. the XLM-R/NLLB
    * tokenizer comparisons): a language whose fertility is far above
    * the corpus mean is being over-fragmented by the merge table,
    * which inflates its effective sequence length and training cost.
    *
    * Scale shape: the corpus reduces FIRST to a per-group word
    * frequency table (one map-side-combined aggregate, ≤ |groups|·
    * |vocab| rows ≪ corpus tokens), and the encode kernel runs once
    * per DISTINCT word, weighted by its count — the same
    * vocab-bounded trick as [[bpeMerges]]. Output per group: n_words
    * (token occurrences), n_pieces (weighted piece count), fertility
    * (pieces per word, 6 dp).
    */
  def bpeFertility(documents: DataFrame, merges: Seq[(String, String)],
                   groupCol: String = "lang"): DataFrame =
    documents
      .select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(lower(col("text")))).as("word"))
      .groupBy(col("g"), col("word")).agg(count(lit(1)).as("n"))
      .withColumn("np",
        size(graft.functions.native.bpeEncode(col("word"), merges)).cast("long"))
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np")).as("n_pieces"),
        round(sum(col("n") * col("np")).cast("double") / sum(col("n")), 6)
          .as("fertility"))
      .select(col("g").as(groupCol), col("n_words"), col("n_pieces"), col("fertility"))

  /** Stratified corpus mixing: keep a deterministic per-stratum
    * fraction of documents (e.g. lang -> sampling rate) — the data-mix
    * step of corpus assembly. RNG-free: membership is a portable hash
    * of the document id against a basis-point threshold, so the sample
    * is reproducible across runs, cluster sizes and engines, and any
    * document's fate is auditable. Map-only: the filter is a pure
    * column expression, no shuffle at any scale.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       ratesBps: Map[String, Int],
                       defaultBps: Int = 0): DataFrame = {
    require((defaultBps +: ratesBps.values.toSeq).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val threshold = ratesBps.foldLeft(lit(defaultBps)) { case (acc, (k, bps)) =>
      when(col(stratumCol) === k, lit(bps)).otherwise(acc)
    }
    docs.where(
      pmod(TextFunctions.portableHash(col("doc_id").cast("string")), lit(10000)) < threshold)
  }

  /** Quota (cap-per-group) sampling: keep at most `cap` documents per
    * stratum, chosen as the `cap` LOWEST portable content-id hashes —
    * the balancing step of corpus assembly when a count budget per
    * language/source/cluster is the contract (vs [[stratifiedSample]]'s
    * per-stratum rates). RNG-free and order-free like the rest of the
    * sampling family: membership depends only on a document's own id
    * and its stratum's population, so the sample is reproducible
    * across runs, partitionings and engines.
    *
    * Scale shape: rank-within-stratum is a window, but filtering
    * `row_number <= cap` lets Spark 4 rewrite it to WindowGroupLimit —
    * each map task pre-prunes to its local top-`cap` per stratum
    * BEFORE the exchange, so the shuffle carries ≤ cap × strata ×
    * tasks rows, not the corpus (asserted in PlanSpec). A giant
    * stratum therefore costs bounded memory: no full per-group sort
    * materializes anywhere.
    */
  def balancedSample(docs: DataFrame, stratumCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(TextFunctions.portableHash(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Temperature-based stratum resampling — the multilingual-mixing
    * step of XLM-R/mT5-style training (Conneau et al. sample language
    * ℓ with probability ∝ p_ℓ^α, α<1 flattening the head so
    * low-resource strata aren't drowned): compute each stratum's
    * quota as floor(target · n_s^α / Σ n^α) (≥1, ≤n_s), then keep the
    * quota lowest-portable-hash members per stratum — the same
    * RNG-free membership rule as [[balancedSample]], so the sample is
    * reproducible across runs, partitionings and engines.
    *
    * Scale shape: the weight computation runs on the DRIVER over the
    * bounded per-stratum count table (strata are enumerable —
    * languages, sources — not corpus-scaled), folded in ascending
    * stratum order so the float sum has a contracted association
    * order the DuckDB oracle replays exactly (the t_entropy
    * contract). The corpus-side rank filters first against the
    * LITERAL max quota — keeping Spark 4's WindowGroupLimit pre-prune
    * (map tasks drop to their local top-maxQuota per stratum before
    * the exchange) — then exactly against the per-stratum quota from
    * a broadcast join.
    */
  def temperatureSample(docs: DataFrame, stratumCol: String, alpha: Double,
                        target: Long): DataFrame = {
    require(alpha > 0 && target > 0, "alpha and target must be positive")
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .orderBy(col(stratumCol))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wsum = counts.foldLeft(0.0) { case (a, (_, n)) =>
      a + math.pow(n.toDouble, alpha)
    }
    val quotas = counts.map { case (g, n) =>
      val q = math.floor(target * (math.pow(n.toDouble, alpha) / wsum)).toLong
      (g, math.min(n, math.max(1L, q)))
    }
    val maxQuota = quotas.map(_._2).max
    val spark = docs.sparkSession
    import spark.implicits._
    val quotaDf = quotas.toSeq.toDF(stratumCol, "quota")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(TextFunctions.portableHash(col("doc_id").cast("string")).asc,
        col("doc_id").asc)
    docs.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= lit(maxQuota)) // literal bound → WindowGroupLimit
      .join(broadcast(quotaDf), Seq(stratumCol))
      .where(col("__rk") <= col("quota"))
      .select(col("doc_id"), col(stratumCol), col("quota"))
  }

  /** Shard manifest — the integrity/reproducibility record written
    * next to training shards: per shard, the document count, token
    * count, id range, and an ORDER-INDEPENDENT content digest
    * (bit-XOR of per-document 60-bit content hashes — commutative, so
    * any task/partition order produces the same digest, and overflow-
    * free under ANSI arithmetic, unlike a sum). Re-running the
    * manifest after a copy/migration and diffing digests is the
    * standard "did every byte arrive" check; a digest mismatch
    * pinpoints the shard to re-ship.
    *
    * Scale shape: shard assignment is the same content-id hash as
    * [[packSequences]] (map-only); ONE map-side-combined aggregate to
    * |shards| rows — per-doc hashes fold inside the scan, raw text
    * never shuffles.
    */
  def shardManifest(docs: DataFrame, nShards: Int = 256): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.native.tokenCount(col("text")).cast("long").as("n_tok"),
        pmod(TextFunctions.portableHash(col("doc_id").cast("string")), lit(nShards))
          .cast("int").as("shard"),
        graft.functions.native.contentHash60(col("text")).as("h"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(h)").as("digest"))

  /** Token-budget mixture allocation — the planning table between the
    * per-source audit (TextAnalysis.sourceAudit) and the samplers
    * ([[temperatureSample]]/[[stratifiedSample]]): given a target
    * training-token budget and a temperature alpha, how many tokens
    * each source contributes under w_s ∝ (tokens_s)^alpha, and how
    * many EPOCHS of that source that allocation implies (epochs > 1 =
    * the mixture up-samples the source past one pass — the standard
    * repetition-budget readout, cf. the data-constrained scaling
    * literature).
    *
    * Scale shape: one map-combined aggregate reduces the corpus to
    * |sources| rows; the normalizing sum rides a broadcast cross join
    * of that bounded table with its own 1-row total. Map-only over
    * the corpus; everything after is dashboard-sized.
    */
  def tokenBudget(docs: DataFrame, targetTokens: Long, alpha: Double = 0.5,
                  sourceCol: String = "source"): DataFrame = {
    require(targetTokens > 0 && alpha > 0, "target and alpha must be positive")
    val perSrc = docs
      .select(col(sourceCol).as("source"),
        graft.functions.native.tokenCount(col("text")).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok").cast("long")).as("n_tokens"))
      .withColumn("raw_w", pow(col("n_tokens").cast("double"), lit(alpha)))
    val total = perSrc.agg(sum(col("raw_w")).as("w_total"))
    perSrc.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"),
        round(col("raw_w") / col("w_total"), 6).as("weight"),
        round(lit(targetTokens.toDouble) * (col("raw_w") / col("w_total")), 3)
          .as("alloc_tokens"),
        round(lit(targetTokens.toDouble) * (col("raw_w") / col("w_total"))
          / col("n_tokens").cast("double"), 6).as("epochs"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-Res): keep the `k` documents per stratum whose reservoir key
    * ln(u)/w is largest, where w is the caller's weight column (token
    * count for token-budget-proportional selection, a quality or DSIR
    * importance score for quality-weighted selection) and u ∈ (0,1] is
    * derived from the portable content-id hash — each document's
    * inclusion probability is proportional to its weight, the
    * textbook one-pass weighted reservoir scheme. RNG-free like the
    * rest of the sampling family ([[stratifiedSample]] /
    * [[balancedSample]] / [[temperatureSample]]): membership depends
    * only on a document's own id and weight, so the sample is
    * reproducible across runs, partitionings and engines, and any
    * document's fate is auditable.
    *
    * Scale shape: key computation is map-only; the rank filter is
    * `row_number <= k` over (stratum, key desc), which Spark 4
    * rewrites to WindowGroupLimit — map tasks pre-prune to their
    * local top-k per stratum BEFORE the exchange (the
    * [[balancedSample]] contract), so the shuffle carries ≤ k ×
    * strata × tasks rows at any corpus size.
    *
    * u = (h+1)/(HashMod+1) is exact in a double (both operands are
    * small integers) and the key needs one ln() and one division, so
    * the DuckDB oracle reproduces the ordering; emitted keys are
    * 6-dp-rounded (the bm25 float contract).
    */
  def weightedSample(docs: DataFrame, weight: org.apache.spark.sql.Column,
                     k: Int, stratumCol: String): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (TextFunctions.portableHash(col("doc_id").cast("string")) + lit(1L))
      .cast("double") / lit((TextFunctions.HashMod + 1L).toDouble)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__key").desc, col("doc_id").asc)
    docs
      .withColumn("__key", log(u) / greatest(weight.cast("double"), lit(1e-9)))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("doc_id"), col(stratumCol), col("__rk").as("rk"),
        round(col("__key"), 6).as("ares_key"))
  }

  /** Snapshot diff between two corpus versions keyed by `idCol`:
    * classify every id as `added` (present only in the new snapshot),
    * `removed` (only in the old), or `changed` (present in both with
    * different content) — the planning pass of incremental ingestion
    * (recrawl deltas, upsert batches for [[graft.sinks.VectorStoreWriter]]'s
    * incremental mode). Unchanged ids are filtered out, so the output
    * is delta-sized, not corpus-sized.
    *
    * Scale shape: each side reduces MAP-ONLY to (id, sha-256 digest)
    * — 40 bytes/doc — before anything shuffles, so the full-outer
    * join moves digests, never document text, and keys on the id
    * (co-partitioned snapshots of the same corpus join without a
    * repartition under bucketing). Content equality via a 256-bit
    * digest is collision-free at any corpus size (same contract as
    * [[Dedup.exactGroups]]).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String = "doc_id",
                   contentCol: String = "text"): DataFrame = {
    def digests(df: DataFrame, as: String) =
      df.select(col(idCol), sha2(col(contentCol), 256).as(as))
    digests(oldSnap, "old_digest")
      .join(digests(newSnap, "new_digest"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed")
          .otherwise("unchanged").as("status"))
      .where(col("status") =!= "unchanged")
  }

  /** Apply a CDC changelog to a corpus snapshot — the pure-DataFrame
    * twin of a lakehouse MERGE (the reference's incremental
    * delete-before-insert writer semantics, expressed with no table
    * format dependency): `changes` rows are (seq, op ∈ {I,U,D},
    * doc_id, text); the HIGHEST-seq op per doc_id wins, D removes the
    * document, I/U upsert it, untouched base rows pass through.
    * Output is the new snapshot (doc_id, text, origin ∈
    * {base, upsert}). Compose with [[snapshotDiff]] (plan the delta)
    * and [[graft.sinks.VectorStoreWriter]]'s incremental mode (apply
    * it to buckets).
    *
    * Scale shape: the last-writer-wins pick is a row_number window
    * over the CHANGELOG only (delta-sized, never the corpus), and the
    * `<= 1` rank filter lets Spark 4 rewrite it to WindowGroupLimit —
    * map tasks pre-prune to their local latest op per doc before the
    * exchange. The base branch is an anti-join against the distinct
    * touched keys, which AQE broadcasts whenever the delta fits — the
    * corpus itself never shuffles. Deterministic: seq ties break on
    * (op desc, text) so a malformed changelog with duplicate seqs
    * still applies reproducibly.
    */
  /** Last-writer-wins pick over a changelog: the single surviving
    * (highest-seq) op per doc_id. The `<= 1` literal rank filter is
    * the WindowGroupLimit contract (map tasks pre-prune to their
    * local latest op per doc before the exchange — asserted in
    * PlanSpec); [[applyChangelog]] materializes this once.
    */
  def latestOps(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("seq").desc, col("op").desc, col("text").desc)
    changes
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= 1)
      .drop("__rk")
  }

  /** SCD-2 (slowly-changing-dimension, type 2) history build from a
    * CDC changelog: every op becomes a version row with a validity
    * interval — (doc_id, version, op, valid_from_seq, valid_to_seq,
    * is_current), valid_to open (NULL) on the latest op, is_current
    * true only when that latest op is not a delete. The temporal twin
    * of [[applyChangelog]] (which keeps only the winner): feeds
    * point-in-time reconstruction and audit queries.
    *
    * Scale shape: one delta-keyed window over the CHANGELOG (version
    * numbering + lead interval in the same sort), delta-sized output,
    * the corpus itself is never touched. Deterministic: the same
    * (seq, op, text) total order as [[latestOps]], ascending.
    */
  def scd2(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("seq").asc, col("op").asc, col("text").asc)
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_seq", lead(col("seq"), 1).over(w))
      .select(col("doc_id"), col("version"), col("op"),
        col("seq").as("valid_from_seq"), col("valid_to_seq"),
        (col("valid_to_seq").isNull && col("op") =!= "D").as("is_current"))
  }

  def applyChangelog(base: DataFrame, changes: DataFrame): DataFrame = {
    val last = latestOps(changes)
      .localCheckpoint(true) // two consumers: anti-join keys + upserts
    val upserts = last.where(col("op") =!= "D")
      .select(col("doc_id"), col("text"), lit("upsert").as("origin"))
    base
      .join(last.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), lit("base").as("origin"))
      .unionByName(upserts)
  }

  /** Pairwise corpus-overlap matrix: for every pair of groups
    * (sources, shards, languages, snapshots), the number of distinct
    * token n-gram fingerprints the two share, each side's total, and
    * the fingerprint Jaccard — the provenance audit that answers
    * "how much of source B is already in source A" before paying for
    * a full cross-source dedup, and the standard between-corpus
    * contamination estimate (n-gram overlap of pretraining sources,
    * GPT-3 appendix-C style, lifted from doc-level to corpus-level).
    *
    * Scale shape (≤ 62 groups — the common case; groups are
    * enumerable sources/langs/shards, pinned by one bounded distinct):
    * each group gets a BIT, and the corpus collapses through ONE
    * fixed-width exchange — groupBy(hash).agg(bit_or(mask)) — a pure
    * codegen HashAggregate with map-side combine (an earlier
    * collect_set formulation hit ObjectHashAggregate's sort-based
    * fallback past 128 keys and ran 2.5× SLOWER at sf10 than the
    * self-join it replaced; long masks keep the buffer fixed-width).
    * The per-mask counts then map-side-combine to ≤ |observed mask
    * combos| rows, and totals/pairs are HOF expansions of those
    * bounded rows — the corpus is never touched again. Raw text never
    * shuffles; the ~60-bit wide hash family keeps cross-group
    * birthday collisions from inflating the overlap at 10^10+
    * distinct windows (same reasoning as [[decontaminate]]). Beyond
    * 62 groups the operator falls back to the distinct (g, h)
    * self-join shape (hash-keyed, per-hash fan-out ≤ #groups²) — the
    * same adaptive-strategy trade as Dedup.connectedComponents'
    * local/distributed switch. Zero-overlap pairs still appear, via
    * the bounded per-group-total cross join.
    */
  def corpusOverlap(docs: DataFrame, groupCol: String, n: Int = 8): DataFrame = {
    // group values ride as strings in BOTH branches (one output schema,
    // one pair orientation — lexicographic); null groups are excluded
    // up front, matching the old self-join whose null-propagating
    // comparisons silently dropped them
    val fpRaw = docs
      .where(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        explode(graft.functions.native.shingleHashes(col("text"), n, wide = true)).as("h"))
    // the group universe: bounded, enumerable by contract (one tiny
    // distinct — the balancedSample quota-fold class of driver read)
    val names = docs.where(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g")).distinct()
      .collect().map(_.getString(0)).sorted
    val (totals, shared) =
      // empty universe routes to the fallback: its joins handle zero
      // groups, while the bitmask branch's reduce over bit exprs can't
      if (names.nonEmpty && names.length <= 62) {
        val bit = names.zipWithIndex
          .map { case (g, i) => when(col("g") === g, lit(1L << i)) }
          .reduce((a, b) => coalesce(a, b))
        val masks = fpRaw.select(bit.as("m"), col("h"))
          .groupBy(col("h")).agg(bit_or(col("m")).as("mask"))
        val maskCounts = masks.groupBy(col("mask"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true) // consumers: totals + pair expansion
        val nameArr = array(names.map(lit): _*)
        val powers = array(names.indices.map(i => lit(1L << i)): _*)
        val bitsOf = filter(sequence(lit(0), lit(names.length - 1)),
          i => col("mask").bitwiseAND(element_at(powers, i + 1)) =!= 0L)
        val totalsDf = maskCounts
          .select(explode(transform(bitsOf, i => element_at(nameArr, i + 1))).as("g"),
            col("cnt"))
          .groupBy(col("g")).agg(sum(col("cnt")).as("n_fp"))
        val sharedDf = maskCounts
          .select(col("cnt"), bitsOf.as("bs"))
          .where(size(col("bs")) >= 2)
          .select(col("cnt"), explode(flatten(transform(
            sequence(lit(0), size(col("bs")) - 2),
            i => transform(
              slice(col("bs"), i + 2, size(col("bs"))),
              bj => struct(element_at(nameArr, element_at(col("bs"), i + 1) + 1).as("src_a"),
                element_at(nameArr, bj + 1).as("src_b")))))).as("p"))
          .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
          .agg(sum(col("cnt")).as("shared"))
        (totalsDf, sharedDf)
      } else {
        val fp = fpRaw.distinct()
          .localCheckpoint(true) // three consumers: totals + both join sides
        val totalsDf = fp.groupBy(col("g")).agg(count(lit(1)).as("n_fp"))
        val sharedDf = fp.as("a")
          .join(fp.as("b"), col("a.h") === col("b.h") && col("a.g") < col("b.g"))
          .groupBy(col("a.g").as("src_a"), col("b.g").as("src_b"))
          .agg(count(lit(1)).as("shared"))
        (totalsDf, sharedDf)
      }
    totals.as("ta")
      .join(totals.as("tb"), col("ta.g") < col("tb.g"))
      .select(col("ta.g").as("src_a"), col("tb.g").as("src_b"),
        col("ta.n_fp").as("n_a"), col("tb.n_fp").as("n_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        col("n_a"), col("n_b"),
        round(coalesce(col("shared"), lit(0L)) /
          (col("n_a") + col("n_b") - coalesce(col("shared"), lit(0L))), 6)
          .as("jaccard"))
  }

  /** Semantic benchmark decontamination: flag corpus vectors whose
    * embedding is near-duplicate (cosine ≥ threshold) of ANY held-out
    * benchmark/eval vector — the embedding-similarity contamination
    * check modern pipelines run ALONGSIDE [[decontaminate]]'s n-gram
    * check (n-grams miss paraphrases; embeddings catch them). Returns
    * (vec_id, n_matched, max_cos) for contaminated vectors only —
    * callers anti-join to drop them, mirroring [[decontaminate]]'s
    * output contract.
    *
    * Scale shape: eval sets are MBs against a 100 TB corpus, so the
    * benchmark side is broadcast (explicit hint — it is the whole
    * point of the operator) and the corpus streams through a
    * broadcast nested-loop join with the cosine predicate applied
    * per pair: corpus embeddings NEVER shuffle. Only matching pairs
    * (a vanishing fraction) reach the per-vec_id aggregate, which
    * map-side-combines to one row per contaminated vector. Brute
    * force over the benchmark is deliberate: |bench| is small and
    * exactness matters for a DROP decision — an LSH prefilter here
    * would trade silent recall loss for nothing (the BNLJ is
    * O(|corpus|·|bench|) map-side work with no shuffle at all).
    */
  def decontaminateSemantic(corpus: DataFrame, benchmark: DataFrame,
                            threshold: Double = 0.9): DataFrame = {
    val bench = broadcast(
      benchmark.select(col("vec_id").as("bench_id"), col("embedding").as("be")))
    corpus.select(col("vec_id"), col("embedding"))
      .join(bench,
        graft.functions.VectorFunctions.cosine(col("embedding"), col("be")) >= threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_matched"),
        round(max(graft.functions.VectorFunctions.cosine(col("embedding"), col("be"))), 6)
          .as("max_cos"))
  }

  /** End-to-end curation funnel — the flagship composition every
    * pre-training corpus goes through, with the audit table that
    * every data report leads with: how many documents and tokens
    * survive each stage.
    *
    * Stages (standard order — cheap map-only filters first, joins on
    * the shrunken survivor set after):
    *   0_input         raw corpus
    *   1_lang          language-ID == targetLang (map-only)
    *   2_quality       heuristic quality gate (map-only,
    *                   TextAnalysis.corpusFilter rules)
    *   3_exact_dedup   keep min doc_id per distinct text among stage-2
    *                   survivors (one hash aggregate)
    *   4_decontaminate drop docs sharing any n-gram with the
    *                   benchmark (decontaminate join, bench side tiny
    *                   ⇒ AQE broadcast)
    *
    * Scale shape: ONE corpus pass computes every per-doc flag (lang
    * and quality are column expressions riding the same projection);
    * the dedup keeper aggregate and the decontamination join run on
    * progressively smaller survivor sets; the funnel itself is a
    * single conditional-sum aggregate over the flag table unpivoted
    * to 5 rows. No stage rescans raw text more than the one time its
    * operator needs it.
    */
  def curate(corpus: DataFrame, benchmark: DataFrame,
             targetLang: String = "en", n: Int = 8): DataFrame = {
    import graft.operators.TextAnalysis
    val flagged = corpus
      .withColumn("n_tok", graft.functions.native.tokenCount(col("text")))
      .withColumn("pass_lang", TextAnalysis.langId(col("text")) === targetLang)
      .withColumn("pass_q",
        col("pass_lang") && TextAnalysis.corpusFilterKeep(col("text")))
      .localCheckpoint(true) // 3 consumers: keeper agg, decontam join, funnel agg

    // exact-dedup keepers among quality survivors — grouped on the
    // 256-bit digest (Dedup.exactGroups discipline): the aggregate
    // shuffles 32-byte keys, never the documents themselves
    val keepers = flagged.where(col("pass_q"))
      .groupBy(coalesce(sha2(col("text"), 256), lit("<null-text>")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("is_keeper"))

    // contaminated doc ids among quality survivors (bench ⇒ broadcast)
    val contaminated = decontaminate(flagged.where(col("pass_q")), benchmark, n)
      .select(col("doc_id"), lit(true).as("is_dirty"))

    // funnel needs only ids + flags + token counts: drop text before
    // the survivor joins so their exchanges carry fixed-width rows
    val full = flagged
      .select(col("doc_id"), col("n_tok"), col("pass_lang"), col("pass_q"))
      .join(keepers, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("pass_dedup", col("pass_q") && coalesce(col("is_keeper"), lit(false)))
      .withColumn("pass_clean", col("pass_dedup") && col("is_dirty").isNull)

    def stage(name: String, cond: org.apache.spark.sql.Column) =
      struct(lit(name).as("stage"),
        sum(cond.cast("long")).as("docs"),
        sum(when(cond, col("n_tok").cast("long")).otherwise(0L)).as("tokens"))

    full.agg(array(
        stage("0_input", lit(true)),
        stage("1_lang", col("pass_lang")),
        stage("2_quality", col("pass_q")),
        stage("3_exact_dedup", col("pass_dedup")),
        stage("4_decontaminate", col("pass_clean"))).as("stages"))
      .select(explode(col("stages")).as("s"))
      .select(col("s.stage"), col("s.docs"), col("s.tokens"))
  }
}
