package graft

import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

class IvfFramesSpec extends SparkSpecBase {
  import spark.implicits._

  test("knnIvf with full probing matches brute force exactly") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val ivf = Similarity.knnIvf(emb, queries, k = 5, nLists = 8, nProbe = 8)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val bf = Similarity.knnBruteForceBatch(emb, queries, k = 5)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == bf)
  }

  test("writeIvfIndex/probeIvfIndex: persisted lists prune at the partition level") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    Similarity.writeIvfIndex(emb, dir, nLists = 8)
    val query = emb.where(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val probe = Similarity.probeIvfIndex(spark, dir, query, k = 5, nProbe = 2)
    // partition pruning: the list_id IN (...) filter must reach the
    // scan's PartitionFilters — unprobed lists are never even listed
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected list_id partition pruning in:\n$plan")
    val got = probe.collect()
    // the query vector itself lives in a probed list and must rank #1
    assert(got.head.getLong(0) == 0L && got.head.getDouble(1) > 0.999999)
    assert(got.length == 5)
    // self-consistency: probing ALL lists reproduces exact brute force
    val all = Similarity.probeIvfIndex(spark, dir, query, k = 5, nProbe = 8)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val bf = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedlit(query.toSeq)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(all == bf)
  }

  test("appendToIvfIndex: copy-on-write lists, rebuild-equal probe, drift recorded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val base = emb.where(col("vec_id") < 400)
    val batch = emb.where(col("vec_id") >= 400 && col("vec_id") < 403) // 3 vectors → ≤3 touched lists
    Similarity.writeIvfIndex(base, dir, nLists = 8)
    def listFiles(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(s"$dir/lists")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("list_id="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length(), f.lastModified())).toSet)
        .toMap
    }
    val before = listFiles()
    Similarity.appendToIvfIndex(spark, dir, batch)
    val after = listFiles()
    // exactly base ∪ batch, each vector once
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.count() == 403 && lists.select("vec_id").distinct().count() == 403)
    // drift audit: generation 0, one row per touched list, n_added sums
    // to the batch, mean_cos a valid cosine
    val drift = spark.read.parquet(s"$dir/drift").collect()
    assert(drift.nonEmpty && drift.forall(_.getAs[Long]("generation") == 0L))
    assert(drift.map(_.getAs[Long]("n_added")).sum == 3L)
    assert(drift.forall { r =>
      val c = r.getAs[Double]("mean_cos"); c >= -1.0001 && c <= 1.0001 })
    val touched = drift.map(r => s"list_id=${r.getAs[Long]("list_id")}").toSet
    // copy-on-write: only the touched partitions changed; every
    // untouched list directory keeps its files byte-identical
    assert(touched.size <= 3 && touched.size < before.size)
    before.foreach { case (part, files) =>
      if (!touched.contains(part))
        assert(after(part) == files, s"untouched $part was rewritten")
      else assert(after(part) != files, s"touched $part was not rewritten")
    }
    // full-probe over the appended index ≡ brute force over the union
    // (and therefore ≡ a full rebuild probed at nProbe = nLists)
    val query = emb.where(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val got = Similarity.probeIvfIndex(spark, dir, query, k = 5, nProbe = 8)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val bf = base.union(batch).select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedlit(query.toSeq)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == bf)
    // pruning still file-listing-level after the append
    val probe = Similarity.probeIvfIndex(spark, dir, query, k = 5, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"), plan)
    // a second append records the next generation
    Similarity.appendToIvfIndex(spark, dir,
      emb.where(col("vec_id") >= 403 && col("vec_id") < 405))
    val gens = spark.read.parquet(s"$dir/drift")
      .select("generation").distinct().as[Long].collect().sorted.toSeq
    assert(gens == Seq(0L, 1L))
    assert(spark.read.parquet(s"$dir/lists").count() == 405)
    // UPSERT: re-ingesting an existing vec_id with a CHANGED embedding
    // replaces the stale version (wherever its old list was) instead
    // of duplicating it — the reference's incremental replace-by-id
    val newEmb = emb.where(col("vec_id") === 450)
      .select("embedding").as[Array[Float]].head()
    Similarity.appendToIvfIndex(spark, dir,
      Seq((0L, newEmb)).toDF("vec_id", "embedding"))
    val lists2 = spark.read.parquet(s"$dir/lists")
    assert(lists2.count() == 405) // replaced, not appended
    val rows0 = lists2.where(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].collect()
    assert(rows0.length == 1 && rows0.head.sameElements(newEmb))
    // and the replacement is what probing now sees
    val probeNew = Similarity.probeIvfIndex(spark, dir, newEmb,
      k = 3, nProbe = 8).as[(Long, Double)].collect()
    assert(probeNew.count(_._1 == 0L) == 1)
    assert(probeNew.find(_._1 == 0L).get._2 > 0.999999)
  }

  test("appendToIvfIndex: in-batch duplicate ids, stale-only drift rows, emptied lists dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-upsert").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    Similarity.writeIvfIndex(emb.where(col("vec_id") < 100), dir, nLists = 4)
    val byList = spark.read.parquet(s"$dir/lists")
      .select(col("list_id").cast("long"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted.toSeq }
    // two distinct non-empty lists to play donor/victim
    val lists = byList.filter(_._2.size >= 2).keys.toSeq.sorted
    assert(lists.size >= 2, s"need 2 lists with >=2 vectors, got $byList")
    val victim = lists.head; val donor = lists.last
    val donorEmb = spark.read.parquet(s"$dir/lists")
      .where(col("list_id") === donor && col("vec_id") === byList(donor).head)
      .select("embedding").as[Array[Float]].head()

    // (1) in-batch duplicate vec_id resolves to ONE stored row,
    // deterministically the lexicographically-greater embedding
    val dupA = donorEmb.clone(); dupA(0) = -100f
    val dupB = donorEmb.clone(); dupB(0) = 100f
    Similarity.appendToIvfIndex(spark, dir,
      Seq((9000L, dupA), (9000L, dupB)).toDF("vec_id", "embedding"))
    val stored = spark.read.parquet(s"$dir/lists").where(col("vec_id") === 9000L)
      .select("embedding").as[Array[Float]].collect()
    assert(stored.length == 1, s"dup id stored ${stored.length} times")
    assert(stored.head(0) == 100f, "dedupe must keep the greater embedding")

    // (2) a list touched ONLY by stale-copy removal (one id moves out,
    // nothing moves in) still records a drift row, with n_added = 0
    val gen2 = {
      val moved = byList(victim).head
      Similarity.appendToIvfIndex(spark, dir,
        Seq((moved, donorEmb)).toDF("vec_id", "embedding"))
      val drift = spark.read.parquet(s"$dir/drift")
      val g = drift.agg(max(col("generation"))).head().getLong(0)
      val rows = drift.where(col("generation") === g)
        .select(col("list_id").cast("long"), col("n_added"))
        .as[(Long, Long)].collect().toMap
      assert(rows.get(victim).contains(0L),
        s"stale-only list $victim missing its n_added=0 drift row: $rows")
      assert(rows(donor) >= 1L, rows.toString)
      g
    }

    // (3) re-ingesting EVERY remaining id of the victim list (all
    // assigned elsewhere) must DELETE its partition directory — under
    // plain dynamic overwrite the all-stale files would survive and
    // probes would return dead copies
    val remaining = byList(victim).tail
    Similarity.appendToIvfIndex(spark, dir,
      remaining.map(id => (id, donorEmb)).toDF("vec_id", "embedding"))
    assert(!new java.io.File(s"$dir/lists/list_id=$victim").exists(),
      s"emptied list_id=$victim directory must be dropped")
    val all = spark.read.parquet(s"$dir/lists")
    // every id exactly once — no stale duplicates anywhere
    assert(all.count() == all.select("vec_id").distinct().count())
    assert(all.where(col("vec_id").isin(byList(victim): _*))
      .select(col("list_id").cast("long")).distinct()
      .as[Long].collect().toSeq == Seq(donor))
    // drift generations advanced monotonically
    val gens = spark.read.parquet(s"$dir/drift")
      .select("generation").distinct().as[Long].collect().sorted.toSeq
    assert(gens == (0L to (gen2 + 1)).toSeq, gens.toString)
  }

  test("maybeRetrainIvfIndex: fires only past the drift threshold, re-trains only drifted lists") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-retrain").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    Similarity.writeIvfIndex(emb.where(col("vec_id") < 100), dir, nLists = 4)
    Similarity.appendToIvfIndex(spark, dir,
      emb.where(col("vec_id") >= 400 && col("vec_id") < 450))
    def listFiles(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(s"$dir/lists")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("list_id="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length())).toSet).toMap
    }
    def latestDrift(): Map[Long, Double] = {
      val d = spark.read.parquet(s"$dir/drift")
      val g = d.groupBy(col("list_id").cast("long").as("l"))
        .agg(max(col("generation")).as("g"))
      d.select(col("list_id").cast("long").as("l"), col("generation").as("g"),
          col("mean_cos"))
        .join(g, Seq("l", "g"))
        .select(col("l"), col("mean_cos")).as[(Long, Double)].collect().toMap
    }
    val obs = latestDrift()
    assert(obs.nonEmpty)
    val minCos = obs.values.min

    // NOT firing: threshold below every observation — index untouched
    val before = listFiles()
    val centBefore = spark.read.parquet(s"$dir/centroids")
      .select(col("list_id").cast("long"), col("centroid"))
      .as[(Long, Array[Float])].collect().toMap
    assert(Similarity.maybeRetrainIvfIndex(spark, dir, minCos - 1e-9).isEmpty)
    assert(listFiles() == before, "no-fire must leave every list file alone")

    // FIRING: threshold just above the worst list — exactly the lists
    // below it re-train
    val thr = minCos + 1e-9
    val expectDrifted = obs.filter(_._2 < thr).keys.toSeq.sorted
    val got = Similarity.maybeRetrainIvfIndex(spark, dir, thr)
    assert(got == expectDrifted && got.nonEmpty, s"got $got vs $expectDrifted")
    // re-trained centroid moved; untouched lists' files are byte-identical
    val centAfter = spark.read.parquet(s"$dir/centroids")
      .select(col("list_id").cast("long"), col("centroid"))
      .as[(Long, Array[Float])].collect().toMap
    got.foreach(l => assert(!centAfter(l).sameElements(centBefore(l)),
      s"drifted list $l centroid did not move"))
    val after = listFiles()
    val gen = spark.read.parquet(s"$dir/drift")
      .agg(max(col("generation"))).head().getLong(0)
    val touched = spark.read.parquet(s"$dir/drift")
      .where(col("generation") === gen)
      .select(col("list_id").cast("long")).as[Long].collect().toSet
    before.keys.foreach { part =>
      val id = part.stripPrefix("list_id=").toLong
      if (!touched(id) && after.contains(part))
        assert(after(part) == before(part), s"untouched $part was rewritten")
      if (!got.contains(id))
        assert(centAfter(id).sameElements(centBefore(id)),
          s"non-drifted list $id centroid changed")
    }
    // index integrity: every id exactly once, nothing lost
    val all = spark.read.parquet(s"$dir/lists")
    assert(all.count() == 150 && all.select("vec_id").distinct().count() == 150)
    // full probe still exact brute force over the corpus
    val query = emb.where(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val probed = Similarity.probeIvfIndex(spark, dir, query, k = 5, nProbe = 4)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val bf = emb.where(col("vec_id") < 100)
      .union(emb.where(col("vec_id") >= 400 && col("vec_id") < 450))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedlit(query.toSeq)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(probed == bf)
    // the trigger reset: the re-trained lists do not fire again at the
    // same threshold (their centroid now sits on their mean)
    val second = Similarity.maybeRetrainIvfIndex(spark, dir, thr)
    assert(second.intersect(got).isEmpty, s"retrained lists fired again: $second")
  }

  test("ivfUpsertStream: seed freezes centroids, restart upserts replace by id") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft-ivfup")
    val in = Files.createDirectory(work.resolve("in"))
    val idx = work.resolve("idx").toString
    val ckpt = work.resolve("ckpt").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ivfup-stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, in.resolve(name)); ()
    }
    def vec(seed: Int): Array[Float] =
      Array.tabulate(4)(d => (((seed * 31 + d * 7) % 19) - 9).toFloat)
    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
        .option("maxFilesPerTrigger", 1).parquet(in.toString)
      // retrainEvery = 0: this test documents the bare frozen-centroid
      // upsert semantics; the in-loop re-train policy has its own spec
      graft.streaming.StreamingIngest.ivfUpsertStream(stream, idx, ckpt,
        nLists = 4, retrainEvery = 0).start().awaitTermination()
    }
    // run 1 seeds: centroids sampled from THIS batch, then frozen
    stage((0L until 10L).map(i => (i, vec(i.toInt).toSeq)).toDF("vec_id", "embedding"),
      "001.parquet")
    run()
    val frozen = spark.read.parquet(s"$idx/centroids")
      .orderBy(col("list_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(frozen.nonEmpty && frozen.size <= 4)
    // run 2 (restart, same checkpoint): new ids append, id 5 re-ingests
    // NEGATED — the upsert must replace its stored row, not add one
    val neg5 = vec(5).map(x => -x)
    stage(((10L until 20L).map(i => (i, vec(i.toInt).toSeq)) :+ ((5L, neg5.toSeq)))
      .toDF("vec_id", "embedding"), "002.parquet")
    run()
    val store = spark.read.parquet(s"$idx/lists")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(store.map(_._1).sorted.toSeq == (0L until 20L), "one row per id")
    assert(store.toMap.apply(5L).toSeq == neg5.toSeq, "re-ingested id replaced")
    // centroids FROZEN: byte-for-byte the seed batch's sample
    val after = spark.read.parquet(s"$idx/centroids")
      .orderBy(col("list_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(after == frozen, "append moved the frozen centroids")
    Files.walk(work).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
  }

  test("trainCentroids: Lloyd iterations converge to well-separated cluster centers") {
    // three tight clusters on orthogonal axes; a bad seed (all three
    // seeds inside cluster A) must still migrate two centroids out
    def jitter(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (v, d) => v + (if (d == (i % 3) + 3) 0.01f * (i % 5) else 0f) }
    val a = Array(1f, 0f, 0f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f, 0f, 0f)
    val c = Array(0f, 0f, 1f, 0f, 0f, 0f)
    val corpus = ((0 until 20).map(i => (i.toLong, jitter(a, i))) ++
      (20 until 40).map(i => (i.toLong, jitter(b, i))) ++
      (40 until 60).map(i => (i.toLong, jitter(c, i)))).toDF("vec_id", "embedding")
    val seed = corpus.where(col("vec_id") < 3) // all seeds in cluster A
      .select(col("vec_id").as("list_id"), col("embedding").as("centroid"))
    val trained = Similarity.trainCentroids(corpus, seed, iters = 5)
      .select("centroid").as[Array[Float]].collect()
    assert(trained.length == 3)
    // each true center must have SOME trained centroid highly aligned
    for (center <- Seq(a, b, c)) {
      def cos(x: Array[Float], y: Array[Float]): Double = {
        val dot = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
        dot / (math.sqrt(x.map(v => v.toDouble * v).sum) * math.sqrt(y.map(v => v.toDouble * v).sum))
      }
      assert(trained.exists(t => cos(t, center) > 0.99),
        s"no trained centroid near ${center.toSeq}")
    }
  }

  test("knnIvf with trained centroids and full probing still matches brute force") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val ivf = Similarity.knnIvf(emb, queries, k = 5, nLists = 8, nProbe = 8, trainIters = 2)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val bf = Similarity.knnBruteForceBatch(emb, queries, k = 5)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == bf)
  }

  test("knnIvf with partial probing returns correctly-ranked subset") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val got = Similarity.knnIvf(emb, queries, k = 5, nLists = 8, nProbe = 2).collect()
    assert(got.nonEmpty)
    val byQuery = got.groupBy(_.getAs[Long]("query_id"))
    for ((_, rows) <- byQuery) {
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      // ranks contiguous from 1, cosines non-increasing
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("sampleFrames: even fan-out, bytes partition the blob") {
    val media = Seq(
      Multimodal.MediaRecord(1L, (0 until 103).map(_.toByte).toArray, "video/mp4", ""),
      Multimodal.MediaRecord(2L, Array.empty[Byte], "video/mp4", "")
    ).toDS()
    val frames = Multimodal.sampleFrames(spark, media, nFrames = 4).collect()
    assert(frames.forall(_.media_id == 1L)) // empty blob yields no frames
    assert(frames.length == 4)
    assert(frames.map(_.frame.length).sum == 103) // frames partition the blob
    val rejoined = frames.sortBy(_.frame_idx).flatMap(_.frame)
    assert(rejoined.toSeq == (0 until 103).map(_.toByte).toSeq)
  }

  test("resizeStub keeps the row contract and records the target size") {
    val media = Seq(Multimodal.MediaRecord(1L, "abc".getBytes, "image/png", "")).toDS()
    val out = Multimodal.resizeStub(media, 224, 224).head()
    assert(out.getAs[Int]("target_width") == 224)
    assert(out.getAs[Array[Byte]]("content").sameElements("abc".getBytes))
  }

  test("ivfUpsertStream: in-loop drift policy fires one partial re-train; no-fire appends leave centroids byte-identical") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft-ivfrt")
    val in = Files.createDirectory(work.resolve("in"))
    val idx = work.resolve("idx").toString
    val ckpt = work.resolve("ckpt").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ivfrt-stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, in.resolve(name)); ()
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
        .option("maxFilesPerTrigger", 1).parquet(in.toString)
      // DEFAULT wiring: policy check after every append
      graft.streaming.StreamingIngest.ivfUpsertStream(stream, idx, ckpt,
        nLists = 2).start().awaitTermination()
    }
    def jit(i: Long): Float = ((i % 5) * 0.01).toFloat
    // two tight clusters on orthogonal axes
    val clusterA = (0L until 10L).map(i => (i, Seq(10f, 0f, 0f, jit(i))))
    val clusterB = (10L until 20L).map(i => (i, Seq(0f, 10f, 0f, jit(i))))
    stage((clusterA ++ clusterB).toDF("vec_id", "embedding"), "001.parquet")
    run()
    def centroids(): Seq[(Long, Seq[Float])] =
      spark.read.parquet(s"$idx/centroids").orderBy(col("list_id"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val frozen = centroids()
    // drifting upsert: every A vector rotates halfway toward e2 — it
    // stays nearest its old list, but that list's mean swings to
    // cos ≈ 0.7 against the frozen centroid, far below the 0.98 gate
    val rotated = (0L until 10L).map(i => (i, Seq(7f, 0f, 7f, jit(i))))
    stage(rotated.toDF("vec_id", "embedding"), "002.parquet")
    run()
    val after = centroids()
    assert(after != frozen, "drift did not fire an in-loop re-train")
    // PARTIAL: at least one centroid is byte-equal to its frozen value
    // (the undrifted cluster's list is never touched)
    val frozenMap = frozen.toMap
    assert(after.exists { case (id, c) => frozenMap.get(id).contains(c) },
      s"re-train touched every centroid: $frozen -> $after")
    // exactly ONE re-train ran: generations are 0 (the append) and 1
    // (the re-train log), nothing more
    val maxGen = spark.read.parquet(s"$idx/drift")
      .agg(max(col("generation"))).head().getLong(0)
    assert(maxGen == 1L, s"expected generations 0,1 — got max $maxGen")
    // probes stay EXACT through the production path after the re-train
    val q = Array(7f, 0f, 7f, 0f)
    val got = Similarity.probeIvfIndex(spark, idx, q, k = 5, nProbe = 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val store = spark.read.parquet(s"$idx/lists")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedlit(q.toSeq)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == store)
    // no-fire batch: fresh ids aligned with a CURRENT list mean — the
    // policy check runs and declines; the centroid files stay
    // byte-identical (values AND mtimes)
    def centroidFiles(): Map[String, (Long, Long)] = {
      val root = java.nio.file.Paths.get(idx, "centroids")
      val out = scala.collection.mutable.Map[String, (Long, Long)]()
      java.nio.file.Files.walk(root).forEach { pth =>
        val f = pth.toFile
        if (f.isFile && f.getName.endsWith(".parquet"))
          out(root.relativize(pth).toString) = (f.length(), f.lastModified())
      }
      out.toMap
    }
    val filesBefore = centroidFiles()
    val aligned = (100L until 103L).map(i => (i, Seq(0f, 10f, 0f, jit(i))))
    stage(aligned.toDF("vec_id", "embedding"), "003.parquet")
    run()
    assert(centroidFiles() == filesBefore,
      "a no-drift append mutated the centroids")
    Files.walk(work).sorted(java.util.Comparator.reverseOrder())
      .forEach(pth => { Files.deleteIfExists(pth); () })
  }
}
