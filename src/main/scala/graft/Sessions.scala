package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-session builder for the runnable entry points
  * (TrainMain / StreamMain / PipelineMain): env-overridable master and
  * core count, shuffle partitions sized to cores, UTC. A single
  * definition keeps the combined PipelineMain session byte-identical to
  * the tasks it sequences — divergence between entry points was the
  * failure mode of copying this block per main. */
private[graft] object Sessions {

  /** Always use the sort-based shuffle writer, never the bypass-merge
    * writer (round-15 measurement, guide §2.2/§6 small-files logic
    * applied to shuffle files): the bypass writer creates one file per
    * (map task × reduce partition) — at shuffle.partitions ≈ cores that
    * is ~1000 file creates/closes per exchange, and a 32×32 exchange of
    * KB-sized blocks measured 0.45 s vs 0.24 s under the sort writer
    * (one sorted file + index per map task). Scale-inert by
    * construction: the bypass path only ever engages when reduce
    * partitions ≤ this threshold, so production shuffles (partitions ≫
    * cores) already take the sort path — this just stops the
    * small-shuffle regime from using the slower writer. */
  val BypassMergeThreshold = "1"

  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", BypassMergeThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }
}
