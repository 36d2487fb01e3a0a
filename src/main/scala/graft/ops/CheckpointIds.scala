package graft.ops

import org.apache.spark.sql.DataFrame

/** PRECISE block attribution for eager localCheckpoint release
  * disciplines. The previous idiom — diff `getPersistentRDDs` before
  * and after the checkpoint — attributes ANY RDD persisted in the
  * window to the caller, including a concurrent thread's own
  * localCheckpoint in the same SparkSession; unpersisting a foreign
  * lineage-truncated RDD breaks that thread's frame PERMANENTLY
  * (recompute is impossible once the lineage is gone). An eagerly
  * checkpointed frame's plan is a [[org.apache.spark.sql.execution.LogicalRDD]]
  * leaf wrapping exactly the persisted RDD, so the ids can be read off
  * the frame itself — no session-global snapshot, no misattribution. */
object CheckpointIds {

  /** RDD ids of the checkpointed leaves of `df` (empty if the frame is
    * not checkpoint-backed). Safe to unpersist exactly these. */
  def of(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet

  /** Unpersist exactly the checkpointed leaves of `df` (non-blocking —
    * the release discipline's default). */
  def release(df: DataFrame): Unit = {
    val ids = of(df)
    df.sparkSession.sparkContext.getPersistentRDDs
      .filter { case (id, _) => ids(id) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
