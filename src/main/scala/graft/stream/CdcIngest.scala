package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the streaming twin of `q_cdc_upsert`: maintain a
  * compacted one-row-per-key SNAPSHOT of a keyed changelog stream, so
  * downstream consumers read current state without ever replaying history
  * (the compacted-topic / table-maintenance pattern; the reference
  * re-reads its bronze layer end to end instead).
  *
  * Merge is TS-MONOTONE, not last-writer-wins: between the standing row
  * and the batch's compacted row, the one with the greater (ts, seq)
  * wins. That makes the apply idempotent under at-least-once replay AND
  * safe under out-of-order redelivery of whole batches — an older batch
  * replayed after a newer one cannot regress the snapshot. Delete
  * tombstones (op = "D") are RETAINED in the snapshot with their
  * timestamp (filtered by [[currentState]]), so a late upsert older than
  * the delete cannot resurrect the key. Tombstones can be pruned once
  * older than the redelivery horizon — a maintenance concern, not a
  * correctness one.
  *
  * Snapshot storage is VERSIONED: batch B writes the full merged state to
  * `snapshotDir/v=B` (parquet `_SUCCESS` marks completion) and the reader
  * picks the highest complete version. A replayed batch overwrites its
  * own version directory — convergent, never duplicated; a crash
  * mid-write leaves an incomplete dir the reader ignores. Older versions
  * past a keep-window are pruned best-effort after each commit.
  *
  * Scale shape: only the micro-batch is windowed (per-key top-1 compacts
  * via WindowGroupLimit before any exchange); the standing snapshot joins
  * once on the key — at 100 TB the snapshot is bucketed by key so the
  * full-outer merge is co-partitioned, and the rewrite cost is bounded by
  * snapshot size, not history size. For key spaces where even a full
  * rewrite per trigger is too much, partition the snapshot by key range
  * and overwrite only touched partitions (dynamic partition overwrite,
  * as `DedupIngest.writeBatchPartition` does).
  */
final class CdcIngest(
    spark: SparkSession,
    keyCol: String,
    tsCol: String,
    seqCol: String,
    opCol: String,
    snapshotDir: String,
    keepVersions: Int = 2) extends Serializable {

  private val DeleteOp = "D"

  /** Latest record per key by (ts, seq) — the per-batch compaction. */
  private def compact(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Highest complete (has _SUCCESS) snapshot version, if any. */
  def currentVersion(): Option[Long] = {
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
      .sorted.lastOption
  }

  /** The standing snapshot (tombstones included), empty if none. */
  def snapshot(): Option[DataFrame] =
    currentVersion().map(v => spark.read.parquet(s"$snapshotDir/v=$v"))

  /** Live state: the snapshot minus delete tombstones. */
  def currentState(): DataFrame =
    snapshot() match {
      case Some(df) => df.where(col(opCol) =!= DeleteOp)
      case None     => spark.emptyDataFrame
    }

  /** TS-monotone merge of the standing snapshot with a compacted delta:
    * rows travel as one struct per side so the winner is picked ONCE and
    * expanded, regardless of payload schema. */
  private def merge(base: DataFrame, delta: DataFrame): DataFrame = {
    val cols = delta.columns.toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol).as("__k"), struct(cols.map(col): _*).as(as))
    packed(base, "__b").join(packed(delta, "__d"), Seq("__k"), "full_outer")
      .select(
        when(col("__d").isNull, col("__b"))
          .when(col("__b").isNull, col("__d"))
          .when(struct(col("__d")(tsCol), col("__d")(seqCol)) >=
                struct(col("__b")(tsCol), col("__b")(seqCol)), col("__d"))
          .otherwise(col("__b")).as("__w"))
      .select("__w.*")
  }

  /** One micro-batch: compact, merge, publish version `batchId`.
    * Returns the merged snapshot's row count (tombstones included). */
  def processBatch(batch: DataFrame, batchId: Long): Long = {
    if (batch.isEmpty) return snapshot().map(_.count()).getOrElse(0L)
    val delta = compact(batch)
    val merged = snapshot() match {
      case Some(base) => merge(base, delta)
      case None       => delta
    }
    val out = s"$snapshotDir/v=$batchId"
    merged.write.mode(SaveMode.Overwrite).parquet(out)
    prune(batchId)
    spark.read.parquet(out).count()
  }

  /** Best-effort removal of versions older than the keep-window. A
    * failure here never fails the batch — pruning retries next commit. */
  private def prune(latest: Long): Unit =
    try {
      val dir = new Path(snapshotDir)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(dir).toSeq
        .map(_.getPath)
        .filter(_.getName.startsWith("v="))
        .filter(_.getName.stripPrefix("v=").toLong <= latest - keepVersions)
        .foreach(p => fs.delete(p, true))
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Attach to a streaming frame via foreachBatch. */
  def start(source: DataFrame, queryName: String,
            trigger: org.apache.spark.sql.streaming.Trigger,
            checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = source.writeStream
      .queryName(queryName)
      .foreachBatch((b: DataFrame, id: Long) => { processBatch(b, id); () })
      .trigger(trigger)
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}
