package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-session builder for the runnable entry points
  * (TrainMain / StreamMain / PipelineMain): env-overridable master and
  * core count, shuffle partitions sized to cores, UTC. A single
  * definition keeps the combined PipelineMain session byte-identical to
  * the tasks it sequences — divergence between entry points was the
  * failure mode of copying this block per main. */
private[graft] object Sessions {
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }
}
