package graft

import org.apache.spark.sql.SparkSession

/** Smoke runner mirroring the driver's t1 check: SparkEntry.entry must
  * return rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Sort-path shuffle writer always (see Sessions.BypassMergeThreshold).
      .config("spark.shuffle.sort.bypassMergeThreshold",
        Sessions.BypassMergeThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, 40)
    println(s"[smoke] entry rows = $n (expect > 0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
