package graft

// Throwaway measurement probe for optimization work. NOT part of the
// library surface; deleted before round end.
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.select(col("vec_id"), col("embedding"))
    val vecs = base.union(
      base.where(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 100000000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.01)).cast("float")).as("embedding")))

    def time(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // 1. the dim-stats pass alone
    time("stats") {
      val st = vecs.select(posexplode(col("embedding")).as(Seq("d", "x")))
        .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      st.write.format("noop").mode("overwrite").save()
    }
    // 2. the pair join alone (no HOF scoring)
    time("pairjoin") {
      val pairs = vecs.where(col("vec_id") >= 100000000L)
        .select((col("vec_id") - 100000000L).as("a"), col("vec_id").as("b"))
      pairs
        .join(vecs.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
        .join(vecs.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
        .select(col("a"), col("b"), size(col("ea")) + size(col("eb")))
        .write.format("noop").mode("overwrite").save()
    }
    // 3. full sq8Audit
    time("full") {
      val pairs = vecs.where(col("vec_id") >= 100000000L)
        .select((col("vec_id") - 100000000L).as("a"), col("vec_id").as("b"))
      operators.Similarity.sq8Audit(vecs, pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
