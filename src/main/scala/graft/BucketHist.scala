package graft
import org.apache.spark.sql.functions._

/** Diagnostic main: hyperplane-bucket occupancy histogram for an
  * embeddings table at the auto-scaled plane count — prints bucket
  * count, max/avg occupancy, and the within-bucket pair volume
  * (Σ C(b,2), the LSH candidate stage's exact cost) per table seed.
  * Used to adjudicate the sf10 mutual-kNN cliff (SURVEY §5). */
object BucketHist {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val planes = operators.Similarity.autoPlanes(n)
    for (t <- 0 until 2) {
      val h = emb.select(functions.VectorFunctions
          .hyperplaneBucket(col("embedding"), planes, seed = t).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("nb"), max(col("c")).as("mx"),
          avg(col("c")).as("avg"),
          sum(col("c") * (col("c") - 1) / 2).as("pairs"))
        .head()
      println(s"HIST table=$t n=$n planes=$planes buckets=${h.getLong(0)} " +
        s"max=${h.getLong(1)} avg=${math.round(h.getDouble(2))} pairs=${h.getAs[Any](3)}")
    }
    spark.stop()
  }
}
