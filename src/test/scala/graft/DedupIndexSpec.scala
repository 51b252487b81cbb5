package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The persisted MinHash-LSH dedup index (Dedup.writeDedupIndex /
  * appendToDedupIndex / probeDedupIndex) — the dedup-side twin of the
  * persisted IVF index: equivalence to the from-scratch batch
  * pipeline, append-only file immutability, and degenerate inputs.
  */
class DedupIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Int, Int)] =
    df.select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet

  test("probeDedupIndex equals the from-scratch pipeline, store pairs excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx").toString
    val store = docs.where(col("doc_id") % 3 =!= 0)
    // delta: re-arrivals of store docs (exact dups) plus docs the
    // store never saw — both under fresh ids
    val delta = docs.where(col("doc_id") % 3 === 0)
      .unionByName(docs.where(col("doc_id") % 7 === 1))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Dedup.writeDedupIndex(store, dir)
    val probe = pairSet(Dedup.probeDedupIndex(spark, dir, delta))
    // the batch pipeline over store ∪ delta finds the same pairs, plus
    // store-internal ones the probe correctly does not re-derive
    val full = pairSet(Dedup.minhashLshPairs(store.unionByName(delta))
      .where(col("a") >= 1000000L || col("b") >= 1000000L))
    assert(probe == full,
      s"probe-only: ${probe -- full}\nbatch-only: ${full -- probe}")
    assert(probe.nonEmpty) // the re-arrivals guarantee exact-dup pairs
    // the per-band key bounds must reach the store scan as pushed
    // filters (partition pruning on band + row-group stats on key) —
    // the property that keeps probe IO sub-index at 100 TB
    val plan = Dedup.probeDedupIndex(spark, dir, delta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s+", " ").matches("(?s).*PushedFilters: \\[[^\\]]*key[^\\]]*\\].*"),
      s"expected key bounds pushed into the bands scan:\n$plan")
  }

  test("appendToDedupIndex: pre-existing files byte-identical, probe equals full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-app").toString
    val part1 = docs.where(col("doc_id") % 2 === 0)
    val part2 = docs.where(col("doc_id") % 2 === 1)
    val delta = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Dedup.writeDedupIndex(part1, dir)
    def snapshot(): Map[String, (Long, Long)] = {
      val root = java.nio.file.Paths.get(dir)
      val out = scala.collection.mutable.Map[String, (Long, Long)]()
      java.nio.file.Files.walk(root).forEach { p =>
        val f = p.toFile
        if (f.isFile && f.getName.endsWith(".parquet"))
          out(root.relativize(p).toString) = (f.length(), f.lastModified())
      }
      out.toMap
    }
    val before = snapshot()
    Dedup.appendToDedupIndex(spark, dir, part2)
    val after = snapshot()
    // append-only: every pre-existing file untouched, new files appeared
    before.foreach { case (path, sig) =>
      assert(after.get(path).contains(sig), s"pre-existing $path changed")
    }
    assert(after.size > before.size, "append added no files")
    // probing the appended index ≡ probing a from-scratch full index
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-didx-rb").toString
    Dedup.writeDedupIndex(part1.unionByName(part2), rebuilt)
    assert(pairSet(Dedup.probeDedupIndex(spark, dir, delta)) ==
      pairSet(Dedup.probeDedupIndex(spark, rebuilt, delta)))
  }

  test("compactDedupIndex: small files merge, probe results identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-cmp").toString
    val delta = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Dedup.writeDedupIndex(docs.where(col("doc_id") % 4 === 0), dir)
    // three appends → each band partition accumulates extra files
    (1 to 3).foreach { m =>
      Dedup.appendToDedupIndex(spark, dir, docs.where(col("doc_id") % 4 === m))
    }
    def nFiles(): Int = {
      var n = 0
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        if (p.toFile.isFile && p.toFile.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val before = pairSet(Dedup.probeDedupIndex(spark, dir, delta))
    val filesBefore = nFiles()
    Dedup.compactDedupIndex(spark, dir)
    assert(nFiles() < filesBefore, s"compaction did not reduce $filesBefore files")
    assert(pairSet(Dedup.probeDedupIndex(spark, dir, delta)) == before)
  }

  test("probeDedupIndex: blank-text and empty deltas degrade cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-edge").toString
    Dedup.writeDedupIndex(docs.limit(50), dir)
    val blank = Seq((9000001L, "   "), (9000002L, "")).toDF("doc_id", "text")
    assert(Dedup.probeDedupIndex(spark, dir, blank).isEmpty)
    val empty = docs.where(lit(false))
    val got = Dedup.probeDedupIndex(spark, dir, empty)
    assert(got.isEmpty)
    assert(got.columns.toSeq == Seq("a", "b", "inter", "na", "nb"))
  }
}
