package graft

/** SQL surface: graft_* functions registered on a live session. */
class ExtensionsSpec extends SparkSpecBase {

  test("graft_* SQL functions evaluate like their Column twins") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_poly_hash('hello world') AS h,
        |  graft_content_hash60('hello world') AS h60,
        |  graft_token_count('  a b  c ') AS n,
        |  graft_simhash64('x y z') AS sh,
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  size(graft_shingle_hashes('a b c d', 3)) AS nsh,
        |  size(graft_minhash_sig(graft_shingle_hashes('a b c d', 3), 8)) AS k,
        |  size(graft_hash_embed('a b c', 16)) AS dim,
        |  graft_hyperplane_bucket(array(CAST(1.0 AS FLOAT)), 4) AS bkt,
        |  size(graft_window_hashes('a b c d', 3)) AS nw,
        |  graft_nearest_centroids(array(1.0D, 0.0D),
        |    array(struct(CAST(7 AS BIGINT) AS list_id, array(1.0D, 0.0D) AS centroid),
        |          struct(CAST(9 AS BIGINT) AS list_id, array(0.0D, 1.0D) AS centroid)), 1) AS nc
        |""".stripMargin).head()
    assert(row.getAs[Long]("h") == graft.functions.native.polyHash("hello world"))
    assert(row.getAs[Long]("h60") == graft.functions.native.contentHash60("hello world"))
    assert(row.getAs[Int]("n") == 3)
    assert(row.getAs[Double]("cos") == 1.0)
    assert(row.getAs[Int]("nsh") == 2)
    assert(row.getAs[Int]("k") == 8)
    assert(row.getAs[Int]("dim") == 16)
    assert(row.getAs[Long]("bkt") >= 0 && row.getAs[Long]("bkt") < 16)
    assert(row.getAs[Int]("nw") == 2) // windows at offsets 0 and 1
    assert(row.getSeq[Long](row.fieldIndex("nc")).toSeq == Seq(7L)) // nearest centroid by cosine
  }

  test("graft_piece_count / graft_bpe_encode / graft_mmr_select on the SQL surface") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_piece_count('a-b c!') AS pc,
        |  graft_bpe_encode('table', 't a,l e,ta b,tab le') AS enc,
        |  graft_mmr_select(array(
        |    struct(CAST(10 AS BIGINT) AS id, 0.9D AS rel, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)) AS emb),
        |    struct(CAST(11 AS BIGINT) AS id, 0.89D AS rel, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)) AS emb),
        |    struct(CAST(12 AS BIGINT) AS id, 0.5D AS rel, array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)) AS emb)),
        |    2, 0.5D) AS mmr
        |""".stripMargin).head()
    assert(row.getAs[Int]("pc") == 5) // alnum runs a, b, c + symbols '-', '!'
    assert(row.getSeq[String](row.fieldIndex("enc")) == Seq("table"))
    // 10 first (rel), then the orthogonal 12 over the duplicate 11
    assert(row.getSeq[Long](row.fieldIndex("mmr")).toSeq == Seq(10L, 12L))
  }

  test("graft_avg_hash64 on the SQL surface matches the kernel") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_avg_hash64(encode('aaaaZZZZ', 'UTF-8')) AS ph").head()
    assert(row.getAs[Long]("ph") ==
      graft.functions.native.avgHash64("aaaaZZZZ".getBytes("UTF-8")))
    assert(row.getAs[Long]("ph") != 0L)
  }

  test("graft_misra_gries on the SQL surface finds the heavy token") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (Seq.fill(50)("hot") ++ (0 until 100).map(i => s"cold$i"))
      .toDF("tok").createOrReplaceTempView("mg_toks")
    val cands = spark.sql(
      "SELECT graft_misra_gries(tok, 8) AS c FROM mg_toks")
      .head().getSeq[String](0)
    assert(cands.size <= 8)
    assert(cands.contains("hot")) // freq 50 > N/9 ≈ 17 → must survive
  }

  test("graft_nearest_centroids rejects malformed input at analysis time") {
    GraftExtensions.register(spark)
    // INT list_id (not BIGINT) used to surface as a runtime
    // ClassCastException mid-job; it must be an analysis error
    val intListId = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT graft_nearest_centroids(array(1.0D),
          |  array(struct(7 AS list_id, array(1.0D) AS centroid)), 1)""".stripMargin)
        .head()
    }
    assert(intListId.getMessage.contains("nearestCentroids expects"))
    // non-array vector side
    val scalarVec = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT graft_nearest_centroids('oops',
          |  array(struct(CAST(7 AS BIGINT) AS list_id, array(1.0D) AS centroid)), 1)""".stripMargin)
        .head()
    }
    assert(scalarVec.getMessage.contains("nearestCentroids expects"))
  }

  test("extensions class wires the same definitions") {
    // the injectFunction path can't be exercised on the shared session
    // (extensions apply at construction); assert the catalog is complete
    assert(GraftExtensions.definitions.map(_._1).distinct.size ==
      GraftExtensions.definitions.size)
    assert(new GraftExtensions() != null)
  }
}
