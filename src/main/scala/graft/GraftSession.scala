package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's scale posture baked in (SURVEY §5):
  * AQE on with skew-join splitting and partition coalescing, so the
  * same plans that run at local[32] re-plan themselves on a real
  * cluster; shuffle partitions default to the local core count and are
  * expected to be overridden (or left to AQE) at cluster scale.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ingestion rows can be fat (whole documents): keep scan splits
      // at the default 128m but cap broadcasts at a safe 64m
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
