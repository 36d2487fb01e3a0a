package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one declared query repeatedly and print its formatted
  * plan. Usage: graft.Profile <queryName> [sfDir] [runs]. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Construct inside the timer, like Bench — query functions may run
    // driver-side work (iterative loops, sketch collects) at build time.
    var df = SparkEntry.queries(name)(spark, sfDir)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    df.explain("formatted")
    spark.stop()
  }
}
