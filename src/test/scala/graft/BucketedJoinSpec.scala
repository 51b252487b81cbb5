package graft

import org.apache.spark.sql.functions._

/** The 100 TB fact-fact co-location story: two tables bucketed on the
  * join key join WITHOUT any Exchange — at cluster scale this is the
  * difference between a full-corpus shuffle per join and a local merge
  * per bucket. (SURVEY §5: pre-partitioning / bucketing for repeated
  * fact-fact joins.)
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed fact-fact join is exchange-free and matches the plain join") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val ord = spark.read.parquet(sf() + "/orders.parquet")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
